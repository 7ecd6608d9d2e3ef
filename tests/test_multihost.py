"""Multi-host support: real 2-process distributed run on CPU.

Spawns two coordinated JAX processes (4 virtual CPU devices each) that
form ONE global 8-device mesh, assemble a globally-sharded batch from
per-process host shards, and run a jitted global-mean + one real train
step. This is the actual multi-host code path (jax.distributed +
make_array_from_process_local_data), not a simulation.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from unet_zoo_tpu.parallel import (
    global_mesh, initialize_distributed, is_primary, make_global_batch,
    process_batch_slice, sync_global_devices, fully_replicate_to_host,
)

ok = initialize_distributed()  # MUST precede any backend-initializing call
assert ok, "coordinator env vars must trigger initialization"
assert jax.process_count() == 2
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

mesh = global_mesh()
assert mesh.devices.size == 8

# global batch of 16: each process holds [start, stop)
GLOBAL = 16
start, stop = process_batch_slice(GLOBAL)
assert stop - start == 8
full = np.arange(GLOBAL, dtype=np.float32).reshape(GLOBAL, 1, 1, 1)
# 32x32: a 4-level unet pools 4x4 inputs to zero-size (NaN batch stats)
full = np.broadcast_to(full, (GLOBAL, 32, 32, 3)).copy()
local = full[start:stop]
masks_local = np.ones((8, 32, 32, 1), np.float32)

imgs, masks = make_global_batch(mesh, local, masks_local)
assert imgs.shape == (GLOBAL, 32, 32, 3)
assert not imgs.is_fully_addressable

mean = jax.jit(lambda a: a.mean())(imgs)
got = float(mean)
want = float(full.mean())
assert abs(got - want) < 1e-5, (got, want)

# one real data-parallel train step over the global mesh
from jax.sharding import NamedSharding, PartitionSpec as P
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.train.steps import create_train_state, make_train_step

model = create_model("unet")
state = create_train_state(model, jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32),
                           learning_rate=1e-3)
state = jax.device_put(state, NamedSharding(mesh, P()))
step = make_train_step(model)
state, metrics = step(state, imgs, masks)
loss = float(metrics["loss"])
assert np.isfinite(loss)
assert int(state.step) == 1

gathered = fully_replicate_to_host(metrics)
assert np.isfinite(gathered["loss"])

# multi-host checkpoint: every process participates in the orbax save,
# only the primary writes the JSON sidecar; then a coordinated restore.
import tempfile
from unet_zoo_tpu.train.steps import variables_of
from unet_zoo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

ckpt_dir = os.environ["UZ_TEST_CKPT_DIR"]
save_checkpoint(ckpt_dir, {
    "variables": variables_of(state),
    "step": int(state.step),
    "meta": {"epoch": 1},
})
restored = load_checkpoint(ckpt_dir, {
    "variables": variables_of(state), "step": 0})
assert restored.get("meta", {}).get("epoch") == 1, \
    f"meta missing/wrong: keys={sorted(restored)} meta={restored.get('meta')}"
r0 = jax.tree_util.tree_leaves(restored["variables"])[0]
r0h = fully_replicate_to_host(r0)
assert np.isfinite(np.asarray(r0h)).all(), "restored array not finite"

sync_global_devices("done")
print(f"proc{jax.process_index()} primary={is_primary()} loss={loss:.4f} OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = os.path.join(str(tmp_path), "mh_ckpt")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["UZ_TEST_CKPT_DIR"] = ckpt_dir
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count=4")
        env["XLA_FLAGS"] = " ".join(flags)
        # drop the TPU-tunnel sitecustomize (it initializes the XLA backend
        # at import time, which must not happen before
        # jax.distributed.initialize) and related plumbing
        pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
              if p and "axon" not in p]
        env["PYTHONPATH"] = os.pathsep.join([repo] + pp)
        for key in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                    "PALLAS_AXON_TPU_GEN"):
            env.pop(key, None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-4000:]}"
        assert "OK" in out
    assert "primary=True" in outs[0]
    assert "primary=False" in outs[1]
