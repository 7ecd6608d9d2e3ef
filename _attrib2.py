"""Per-layer attribution for any zoo model: trace times joined to HLO metadata."""
import os, re, sys, time, collections
import jax, jax.numpy as jnp
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.utils.profiling import trace, summarize_trace

name = os.environ.get("M", "mmunet")
b = int(os.environ.get("B", "16"))
res = int(os.environ.get("RES", "256"))
nscan = int(os.environ.get("NSCAN", "4"))
topk = int(os.environ.get("TOPK", "30"))
kwargs = eval(os.environ.get("KW", "{}"))

m = create_model(name, in_channels=3, num_classes=1, dtype=jnp.bfloat16,
                 image_size=res, **kwargs)
x = jnp.zeros((b, res, res, 3), jnp.bfloat16)
v = m.init(jax.random.PRNGKey(0), x)

def fwd(v, seed):
    xb = jax.random.normal(jax.random.PRNGKey(seed), (b, res, res, 3), jnp.bfloat16)
    def body(c, _):
        o = m.module.apply(v, c, train=False)["main"]
        c = c + jnp.pad(o.astype(c.dtype) * 1e-6, ((0,0),(0,0),(0,0),(0,2)))
        return c, ()
    c, _ = jax.lax.scan(body, xb, None, length=nscan)
    return jnp.sum(c.astype(jnp.float32))

compiled = jax.jit(fwd).lower(v, 1).compile()
hlo = compiled.as_text()
meta = {}
for line in hlo.splitlines():
    mm = re.search(r"%?([\w.\-]+) = ([^ ]+) (fusion|convolution|custom-call|reduce-window|reduce)\(", line)
    if mm:
        om = re.search(r'op_name="([^"]+)"', line)
        meta[mm.group(1)] = (mm.group(2), om.group(1) if om else "?")

t0=time.time(); float(compiled(v, 1)); print(f"warm {time.time()-t0:.1f}s", flush=True)
t0=time.time(); float(compiled(v, 2)); dt=time.time()-t0
print(f"{nscan} fwd b{b}: {dt*1000:.1f} ms -> {nscan*b/dt:.0f} img/s", flush=True)
d = f"/tmp/attr_{name}"
with trace(d):
    float(compiled(v, 3))
rows = summarize_trace(d, top_k=topk)
acc = 0
for nm, ms, pct, cat in rows:
    base = nm.split("/")[-1]
    info = meta.get(base)
    lay = f"{info[0]} {info[1][-85:]}" if info else cat
    if not nm.startswith("while"):
        acc += ms
    print(f"{ms/nscan:7.2f} {pct:5.1f}  {base[:26]:26s} {lay[:108]}")
print(f"accounted {acc/nscan:.1f} ms/fwd", flush=True)
