import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from torch_ekpose_tpu import constants
from torch_ekpose_tpu.config import get_default_config
from torch_ekpose_tpu.models import init_model
from torch_ekpose_tpu.decode import device as D
from torch_ekpose_tpu.runtime.estimator import preprocess_jax

h, w = 368, 432
cfg = get_default_config()
model, variables = init_model("vgg2016", input_shape=(1, h, w, 3), dtype=jnp.bfloat16)

@jax.jit
def forward(variables, frame):
    x = preprocess_jax(frame, "vgg")[None].astype(jnp.bfloat16)
    (paf, heatmap), _ = model.apply(variables, x, train=False)
    return paf[0].astype(jnp.float32), heatmap[0].astype(jnp.float32)

rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.uint8)
paf, heatmap = jax.block_until_ready(forward(variables, frame))

k = cfg.DECODE.max_peaks_per_part
cap = cfg.DECODE.max_people * 3
stride = cfg.MODEL.DOWNSAMPLE

@jax.jit
def stage1(heatmaps):
    px, py, _, peak_valid = D._find_topk_peaks(heatmaps[:, :, :18], cfg.TEST.THRESH_HEATMAP, k)
    xf, yf, score = D._refine_peaks(heatmaps[:, :, :18], px, py, stride)
    xi = jnp.trunc(xf).astype(jnp.int32)
    yi = jnp.trunc(yf).astype(jnp.int32)
    return xi, yi, jnp.where(peak_valid, score, 0.0), peak_valid

@jax.jit
def stage2(pafs, xi, yi, peak_valid):
    limb_scores, _ = D._score_all_limbs(pafs, xi, yi, peak_valid, stride, 10, cfg.TEST.THRESH_PAF, cfg.TEST.THRESH_VECTOR_CNT1)
    return limb_scores

@jax.jit
def stage3(limb_scores):
    return jax.vmap(functools.partial(D._greedy_match_one, k=k))(limb_scores)

@jax.jit
def stage4(ia, ib, cscore, cvalid, score):
    pairs = jnp.asarray(constants.COCO_PAIRS)
    cid1 = pairs[:, 0][:, None] * k + jnp.maximum(ia, 0)
    cid2 = pairs[:, 1][:, None] * k + jnp.maximum(ib, 0)
    return D._merge_people(cid1, cid2, cscore, cvalid, score.reshape(-1), cap, k)

xi, yi, score, pv = jax.block_until_ready(stage1(heatmap))
ls = jax.block_until_ready(stage2(paf, xi, yi, pv))
ia, ib, cs, cv = jax.block_until_ready(stage3(ls))
out = jax.block_until_ready(stage4(ia, ib, cs, cv, score))
print("n_peaks:", int(pv.sum()), "n_conn:", int(cv.sum()), "n_people:", int(out[1].sum()))

def bench(f, *a, n=50):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

print(json.dumps({
    "stage1_peaks_ms": round(bench(stage1, heatmap), 3),
    "stage2_score_ms": round(bench(stage2, paf, xi, yi, pv), 3),
    "stage3_match_ms": round(bench(stage3, ls), 3),
    "stage4_merge_ms": round(bench(stage4, ia, ib, cs, cv, score), 3),
}))
