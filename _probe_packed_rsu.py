"""Standalone A/B: a full RSU-7-shaped conv pyramid, standard NHWC vs
batch-packed channels (round-4 follow-up to _probe_smallc.py).

_probe_smallc measured the C=16 conv at 2.6% of MXU peak — far below
even the 12.5% lane-utilization bound — and the dense G=8
channel-concat equivalent at a 3.46x per-conv win despite 8x FLOPs.
The transformation that exploits this on a REAL model moves G batch
samples into the channel dim (x: [B,H,W,C] -> [B/G,H,W,G*C]) and runs
each conv with a block-diagonal kernel (kron with I_G): exact, 8x
FLOPs, full lanes. This probe measures the NET effect on an RSU-7-like
chain (u2net stage 1: in conv 64ch, 6-level enc/dec pyramid at mid=16,
out conv 64ch) including the pack/unpack transposes at the block
boundary — the part the per-conv numbers can't see.

Usage: python _probe_packed_rsu.py [--b 32] [--h 256] [--mid 16]
       [--steps 30]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def pool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "SAME")


def up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def rsu_weights(key, cin, mid, cout, levels, dtype):
    ks = jax.random.split(key, 2 * levels + 2)
    w = {"in": jax.random.normal(ks[0], (3, 3, cin, cout), dtype) * 0.05}
    w["enc1"] = jax.random.normal(ks[1], (3, 3, cout, mid), dtype) * 0.05
    for i in range(2, levels + 1):
        w[f"enc{i}"] = jax.random.normal(
            ks[i], (3, 3, mid, mid), dtype) * 0.05
    for i in range(levels - 1, 1, -1):
        w[f"dec{i}"] = jax.random.normal(
            ks[levels + i], (3, 3, 2 * mid, mid), dtype) * 0.05
    w["dec1"] = jax.random.normal(
        ks[-1], (3, 3, 2 * mid, cout), dtype) * 0.05
    return w


def rsu_fwd(x, w, levels):
    """RSU-L forward shape (convs + relu; BN omitted — it's elementwise
    and identical in both layouts, so it cancels in the A/B)."""
    hxin = jax.nn.relu(conv(x, w["in"]))
    enc = []
    h = hxin
    for i in range(1, levels):
        h = jax.nn.relu(conv(h, w[f"enc{i}"]))
        enc.append(h)
        if i < levels - 1:
            h = pool2(h)
    h = jax.nn.relu(conv(h, w[f"enc{levels}"]))
    for i in range(levels - 1, 0, -1):
        h = jax.nn.relu(conv(jnp.concatenate([h, enc[i - 1]], axis=-1),
                             w[f"dec{i}"]))
        if i > 1:
            h = up2(h)
    return h + hxin


def pack(x, g):
    b, h, w, c = x.shape
    return (x.reshape(b // g, g, h, w, c)
            .transpose(0, 2, 3, 1, 4).reshape(b // g, h, w, g * c))


def unpack(x, g):
    bg, h, w, gc = x.shape
    return (x.reshape(bg, h, w, g, gc // g)
            .transpose(0, 3, 1, 2, 4).reshape(bg * g, h, w, gc // g))


def blockdiag(w, g, in_splits=None):
    """[kh,kw,Cin,Cout] -> [kh,kw,g*Cin,g*Cout] block-diagonal kernel.
    ``in_splits``: channel spans of the UNPACKED input when it is a
    concat of separately-packed parts (each part is g-major in the
    packed layout, so each gets its own kron block, rows concatenated).
    """
    kh, kw, cin, cout = w.shape
    eye = jnp.eye(g, dtype=w.dtype)
    parts = []
    off = 0
    for c in (in_splits or [cin]):
        blk = jnp.einsum("hwio,gk->hwgiko", w[:, :, off:off + c, :], eye)
        parts.append(blk.reshape(kh, kw, g * c, g * cout))
        off += c
    return jnp.concatenate(parts, axis=2)


def rsu_fwd_packed(x, w, levels, g):
    """Same RSU, packed interior: pack after nothing (the in conv packs
    too — its 64ch in/out widths still gain), unpack before the
    residual add at the end."""
    mid = w["enc2"].shape[-1]
    xp = pack(x, g)
    hxin_p = jax.nn.relu(conv(xp, blockdiag(w["in"], g)))
    enc = []
    h = jax.nn.relu(conv(hxin_p, blockdiag(w["enc1"], g)))
    enc.append(h)
    for i in range(2, levels):
        h = pool2(h)
        h = jax.nn.relu(conv(h, blockdiag(w[f"enc{i}"], g)))
        enc.append(h)
    h = jax.nn.relu(conv(enc[-1], blockdiag(w[f"enc{levels}"], g)))
    for i in range(levels - 1, 0, -1):
        cat = jnp.concatenate([h, enc[i - 1]], axis=-1)
        h = jax.nn.relu(conv(cat, blockdiag(w[f"dec{i}"], g,
                                            in_splits=[mid, mid])))
        if i > 1:
            h = up2(h)
    return unpack(h, g) + unpack(hxin_p, g)


def rsu_fwd_packed_mid(x, w, levels, g):
    """Variant C: pack ONLY the mid-channel chain. The in/out 64-ch
    convs are not lane-starved — packing them (variant B) costs G x
    their real time and sank the whole block (measured 0.37x). Here
    enc1 (64->mid) and dec1 (2mid->64) stay standard; pack after enc1,
    unpack before dec1; only the interior mid->mid convs (the 2.6%-SOL
    class) run block-diagonal."""
    mid = w["enc2"].shape[-1]
    hxin = jax.nn.relu(conv(x, w["in"]))
    e1 = jax.nn.relu(conv(hxin, w["enc1"]))
    enc = [pack(e1, g)]
    h = enc[0]
    for i in range(2, levels):
        h = pool2(h)
        h = jax.nn.relu(conv(h, blockdiag(w[f"enc{i}"], g)))
        enc.append(h)
    h = jax.nn.relu(conv(enc[-1], blockdiag(w[f"enc{levels}"], g)))
    for i in range(levels - 1, 1, -1):
        cat = jnp.concatenate([h, enc[i - 1]], axis=-1)
        h = jax.nn.relu(conv(cat, blockdiag(w[f"dec{i}"], g,
                                            in_splits=[mid, mid])))
        h = up2(h)
    cat = jnp.concatenate([unpack(h, g), e1], axis=-1)
    return jax.nn.relu(conv(cat, w["dec1"])) + hxin


def timed(name, fn, gen, steps, n_img):
    gen = jax.jit(gen)

    @jax.jit
    def scan_fn(x, w):
        def body(c, _):
            y = fn(jax.nn.relu(x + (c * 1e-6).astype(x.dtype)), w)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12, None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
        return s + jnp.sum(fn(x, w).astype(jnp.float32))

    x, w = gen(1)
    float(jnp.sum(x.astype(jnp.float32)))
    float(scan_fn(x, w))
    x, w = gen(101)
    float(jnp.sum(x.astype(jnp.float32)))
    t0 = time.perf_counter()
    float(scan_fn(x, w))
    dt = time.perf_counter() - t0
    per = dt / (steps + 1)
    print(f"{name}: {per * 1e3:.2f} ms/block -> "
          f"{n_img / per:.0f} img/s-equivalent  ({dt * 1e3:.0f} ms total)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--mid", type=int, default=16)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--levels", type=int, default=7)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    B, H, L = args.b, args.h, args.levels
    g = max(1, 128 // args.mid)
    if B % g:
        raise SystemExit(f"batch {B} not divisible by G={g}")

    def gen(seed):
        kx, kw = jax.random.split(jax.random.PRNGKey(seed))
        x = jax.random.normal(kx, (B, H, H, args.cin), jnp.bfloat16)
        w = rsu_weights(kw, args.cin, args.mid, args.cout, L, jnp.bfloat16)
        return x, w

    # exactness first (small shapes, f32, CPU-friendly sizes on device)
    xs, ws = jax.jit(lambda: gen(7))()
    ya = rsu_fwd(xs, ws, L)
    yb = rsu_fwd_packed(xs, ws, L, g)
    yc = rsu_fwd_packed_mid(xs, ws, L, g)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    errc = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                 - yc.astype(jnp.float32))))
    print(f"packed exactness: all={err:.2e} mid-only={errc:.2e} (g={g})")

    ta = timed("A standard RSU      ",
               lambda x, w: rsu_fwd(x, w, L), gen, args.steps, B)
    tb = timed(f"B all-packed G={g:2d}   ",
               lambda x, w: rsu_fwd_packed(x, w, L, g), gen,
               args.steps, B)
    tc = timed(f"C mid-packed G={g:2d}   ",
               lambda x, w: rsu_fwd_packed_mid(x, w, L, g), gen,
               args.steps, B)
    print(f"all-packed vs standard: {ta / tb:.2f}x; "
          f"mid-packed vs standard: {ta / tc:.2f}x "
          f"({'WIN' if tc < ta else 'LOSS'})")


if __name__ == "__main__":
    main()
