import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from torch_ekpose_tpu.config import get_default_config
from torch_ekpose_tpu.models import init_model
from torch_ekpose_tpu.decode import device as decode_device
from torch_ekpose_tpu.runtime.estimator import preprocess_jax

h, w = 368, 432
cfg = get_default_config()
model, variables = init_model("vgg2016", input_shape=(1, h, w, 3), dtype=jnp.bfloat16)
decoder = decode_device.build_decoder(cfg)

@jax.jit
def forward(variables, frame):
    x = preprocess_jax(frame, "vgg")[None].astype(jnp.bfloat16)
    (paf, heatmap), _ = model.apply(variables, x, train=False)
    return paf[0].astype(jnp.float32), heatmap[0].astype(jnp.float32)

rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.uint8)
paf, heatmap = jax.block_until_ready(forward(variables, frame))
res = jax.block_until_ready(decoder(heatmap, paf))

n = 50
t0 = time.perf_counter()
for _ in range(n):
    paf, heatmap = forward(variables, frame)
jax.block_until_ready((paf, heatmap))
t_fwd = (time.perf_counter() - t0) / n

t0 = time.perf_counter()
for _ in range(n):
    res = decoder(heatmap, paf)
jax.block_until_ready(res)
t_dec = (time.perf_counter() - t0) / n

print(json.dumps({"forward_ms": round(t_fwd*1e3,3), "decode_ms": round(t_dec*1e3,3)}))
