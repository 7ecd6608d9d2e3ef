"""Pure-Python TensorBoard event writer: wire-format round-trip tests."""

import glob
import os
import struct

from unet_zoo_tpu.utils.tb_writer import (
    EventFileWriter,
    _crc32c,
    _masked_crc,
    read_scalar_events,
)


def test_crc32c_known_vectors():
    # RFC 3720 appendix B.4 test vectors
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"\xff" * 32) == 0x62A8AB43
    assert _crc32c(bytes(range(32))) == 0x46DD794E
    assert _crc32c(b"123456789") == 0xE3069283


def test_scalar_round_trip(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("Epoch/unet_Train_Loss", 0.5, 1)
    w.add_scalar("Epoch/unet_Train_Loss", 0.25, 2)
    w.add_scalar("Epoch/unet_Val_Dice", 0.875, 2)
    w.close()

    (path,) = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    events = read_scalar_events(path)
    assert events == [
        ("Epoch/unet_Train_Loss", 1, 0.5),
        ("Epoch/unet_Train_Loss", 2, 0.25),
        ("Epoch/unet_Val_Dice", 2, 0.875),
    ]


def test_record_framing_crc(tmp_path):
    """Every record's header and payload CRCs verify (TFRecord framing)."""
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("t", 1.0, 7)
    w.close()
    (path,) = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    with open(path, "rb") as f:
        blob = f.read()
    n_records = 0
    i = 0
    while i < len(blob):
        header = blob[i:i + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", blob[i + 8:i + 12])
        assert hcrc == _masked_crc(header)
        data = blob[i + 12:i + 12 + length]
        (dcrc,) = struct.unpack("<I", blob[i + 12 + length:i + 16 + length])
        assert dcrc == _masked_crc(data)
        i += 16 + length
        n_records += 1
    assert n_records == 2  # file_version event + 1 scalar


def test_tensorboard_can_read(tmp_path):
    """Cross-check against the real tensorboard reader when installed."""
    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            RawEventFileLoader,
        )
        from tensorboard.compat.proto import event_pb2
    except Exception:
        import pytest

        pytest.skip("tensorboard not installed")

    w = EventFileWriter(str(tmp_path))
    w.add_scalar("x/y", 3.0, 11)
    w.close()
    (path,) = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    events = [event_pb2.Event.FromString(raw)
              for raw in RawEventFileLoader(path).Load()]
    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 11
    assert events[1].summary.value[0].tag == "x/y"
    assert abs(events[1].summary.value[0].simple_value - 3.0) < 1e-6


def test_loop_writer_fallback(tmp_path, monkeypatch):
    """_make_writer returns a working writer even without torch."""
    import builtins

    real_import = builtins.__import__

    def no_torch(name, *a, **k):
        if name.startswith("torch"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    from unet_zoo_tpu.train.loop import _make_writer

    w = _make_writer(str(tmp_path))
    w.add_scalar("a", 1.5, 3)
    w.close()
    (path,) = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert read_scalar_events(path) == [("a", 3, 1.5)]
