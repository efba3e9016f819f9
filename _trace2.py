import glob, shutil
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from torch_ekpose_tpu.config import get_default_config
from torch_ekpose_tpu.models import cast_params, init_model
from torch_ekpose_tpu.decode import device as D
from torch_ekpose_tpu.runtime.estimator import preprocess_jax

h, w = 368, 432
cfg = get_default_config()
model, variables = init_model("vgg2016", input_shape=(1, h, w, 3), dtype=jnp.bfloat16)
variables = cast_params(variables, jnp.bfloat16)
dec = D.build_decoder(cfg)

@jax.jit
def fused(variables, frame):
    x = preprocess_jax(frame, "vgg")[None].astype(jnp.bfloat16)
    (paf, heatmap), _ = model.apply(variables, x, train=False)
    return dec(heatmap[0].astype(jnp.float32), paf[0].astype(jnp.float32))

rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.uint8)
jax.block_until_ready(fused(variables, frame))

shutil.rmtree("/tmp/jax_trace2", ignore_errors=True)
with jax.profiler.trace("/tmp/jax_trace2"):
    for _ in range(10):
        r = fused(variables, frame)
    jax.block_until_ready(r)

from jax.profiler import ProfileData
p = glob.glob("/tmp/jax_trace2/**/*.xplane.pb", recursive=True)
pd = ProfileData.from_serialized_xspace(open(p[0], "rb").read())
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    tot = {}
    for line in plane.lines:
        for ev in line.events:
            tot[ev.name] = tot.get(ev.name, 0) + ev.duration_ns
    grand = 0
    for name, ns in sorted(tot.items(), key=lambda x: -x[1])[:40]:
        if name.startswith("jit_"):
            print(f"TOTAL {ns/1e6/10:9.4f} ms/iter  {name[:80]}")
        else:
            grand += ns
            print(f"{ns/1e6/10:9.4f} ms/iter  {name[:100]}")
