"""Per-layer attribution for a TRAIN step: trace times joined to HLO metadata.

Same methodology as _attrib2.py (fwd) but over the full train step
(fwd + bwd + clip + AdamW + BN stats), scanned like bench.py so the
numbers line up with BENCH_ALL.json's train column.

  M=unet B=32 RES=256 NSCAN=4 TOPK=40 python _attrib_train.py
"""
import os, re, time
import jax, jax.numpy as jnp
from jax import lax
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.train.steps import create_train_state, make_optimizer
from unet_zoo_tpu.train.losses import multi_output_loss
from unet_zoo_tpu.utils.profiling import trace, summarize_trace

name = os.environ.get("M", "unet")
b = int(os.environ.get("B", "32"))
res = int(os.environ.get("RES", "256"))
nscan = int(os.environ.get("NSCAN", "4"))
topk = int(os.environ.get("TOPK", "40"))
kwargs = eval(os.environ.get("KW", "{}"))

model = create_model(name, in_channels=3, num_classes=1, dtype=jnp.bfloat16,
                     image_size=res, **kwargs)
state = create_train_state(model, jax.random.PRNGKey(0),
                           jnp.zeros((1, res, res, 3), jnp.float32),
                           learning_rate=1e-4)
masks = jax.jit(lambda: (jax.random.uniform(
    jax.random.PRNGKey(7), (nscan, b, res, res, 1)) > 0.5
).astype(jnp.float32))()
float(jnp.sum(masks))


def scan_train(params, batch_stats, opt_state, seed, M):
    X = jax.random.normal(jax.random.PRNGKey(seed),
                          (nscan, b, res, res, 3), jnp.float32)
    tx = make_optimizer(1e-4)

    def body(carry, xm):
        params, batch_stats, opt_state = carry
        xb, mb = xm

        def loss_fn(p, bs):
            var = {"params": p}
            if bs:
                var["batch_stats"] = bs
            out, mut = model.module.apply(
                var, xb, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return multi_output_loss(out, mb, model.loss_weight), mut

        (loss, mut), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return (params, mut.get("batch_stats", batch_stats), opt_state), loss

    carry, losses = lax.scan(body, (params, batch_stats, opt_state), (X, M))
    return jnp.sum(losses)


args0 = (state.params, state.batch_stats, state.opt_state)
compiled = jax.jit(scan_train).lower(*args0, 1, masks).compile()
hlo = compiled.as_text()
meta = {}
for line in hlo.splitlines():
    mm = re.search(r"%?([\w.\-]+) = ([^ ]+) (fusion|convolution|custom-call|reduce-window|reduce)\(", line)
    if mm:
        om = re.search(r'op_name="([^"]+)"', line)
        meta[mm.group(1)] = (mm.group(2), om.group(1) if om else "?")

t0 = time.time(); float(compiled(*args0, 1, masks)); print(f"warm {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); float(compiled(*args0, 2, masks)); dt = time.time()-t0
print(f"{nscan} train b{b}: {dt*1000:.1f} ms -> {nscan*b/dt:.0f} img/s", flush=True)
d = f"/tmp/attr_train_{name}"
with trace(d):
    float(compiled(*args0, 3, masks))
rows = summarize_trace(d, top_k=topk)
acc = 0
for nm, ms, pct, cat in rows:
    base = nm.split("/")[-1]
    info = meta.get(base)
    lay = f"{info[0]} {info[1][-95:]}" if info else cat
    if not nm.startswith("while"):
        acc += ms
    print(f"{ms/nscan:7.2f} {pct:5.1f}  {base[:26]:26s} {lay[:118]}")
print(f"accounted {acc/nscan:.1f} ms/step", flush=True)
