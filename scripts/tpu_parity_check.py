import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""TPU-side device-vs-oracle decode parity on synthetic multi-person scenes."""
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from torch_ekpose_tpu.config import get_default_config
from torch_ekpose_tpu.decode import device as D, oracle
from torch_ekpose_tpu import constants

cfg = get_default_config()
rng = np.random.default_rng(42)
H, W = 46, 54

def synth_scene(rng, n_people):
    ht = np.zeros((H, W, 19), np.float32)
    paf = np.zeros((H, W, 38), np.float32)
    people = []
    for _ in range(n_people):
        cx, cy = rng.uniform(8, W-8), rng.uniform(8, H-8)
        kps = {}
        for j in range(18):
            x = np.clip(cx + rng.normal(0, 4), 1, W-2)
            y = np.clip(cy + rng.normal(0, 4), 1, H-2)
            kps[j] = (x, y)
        people.append(kps)
    yy, xx = np.mgrid[0:H, 0:W]
    for kps in people:
        for j, (x, y) in kps.items():
            g = np.exp(-((xx-x)**2 + (yy-y)**2) / (2*1.5**2))
            ht[:, :, j] = np.maximum(ht[:, :, j], g)
        for li, (p1, p2) in enumerate(constants.COCO_PAIRS):
            x1, y1 = kps[p1]; x2, y2 = kps[p2]
            dx, dy = x2-x1, y2-y1
            n = np.hypot(dx, dy)
            if n < 1e-6: continue
            ux, uy = dx/n, dy/n
            d = np.abs((xx-x1)*uy - (yy-y1)*ux)
            along = (xx-x1)*ux + (yy-y1)*uy
            m = (d < 1.5) & (along > -1) & (along < n+1)
            cx_ch, cy_ch = constants.COCO_PAIRS_NET[li]
            paf[:, :, cx_ch] = np.where(m, ux, paf[:, :, cx_ch])
            paf[:, :, cy_ch] = np.where(m, uy, paf[:, :, cy_ch])
    ht[:, :, 18] = np.clip(1 - ht[:, :, :18].max(-1), 0, 1)
    return ht, paf

def canon(humans):
    return sorted(
        sorted((p, round(bp.x, 4), round(bp.y, 4))
               for p, bp in h.body_parts.items())
        for h in humans
    )

dec = D.build_decoder(cfg)
scenes = [synth_scene(rng, int(rng.integers(1, 5))) for _ in range(8)]
bad = 0
for trial, (ht, paf) in enumerate(scenes):
    res = jax.device_get(dec(jnp.asarray(ht), jnp.asarray(paf)))
    dev_humans = D.humans_from_result(res, H*8, W*8)
    orc_humans = oracle.paf_to_pose_numpy(ht, paf, cfg)
    ok = canon(dev_humans) == canon(orc_humans)
    if not ok:
        bad += 1
        print(f"trial {trial}: MISMATCH dev={len(dev_humans)} orc={len(orc_humans)}")
    else:
        print(f"trial {trial}: ok ({len(dev_humans)} people)")

# the batched decoder (grid-batched Pallas match/merge on TPU) must agree
# with the single-image Pallas path on the same scenes
bdec = D.build_packed_decoder(cfg, batched=True)
hts = jnp.asarray(np.stack([s[0] for s in scenes]))
pafs = jnp.asarray(np.stack([s[1] for s in scenes]))
packed = jax.device_get(bdec(hts, pafs))
for trial, (ht, paf) in enumerate(scenes):
    bat_humans = D.packed_to_humans(packed[trial], H*8, W*8, cfg)
    orc_humans = oracle.paf_to_pose_numpy(ht, paf, cfg)
    ok = canon(bat_humans) == canon(orc_humans)
    if not ok:
        bad += 1
        print(f"batched trial {trial}: MISMATCH bat={len(bat_humans)} orc={len(orc_humans)}")
    else:
        print(f"batched trial {trial}: ok ({len(bat_humans)} people)")
print("PARITY OK" if bad == 0 else f"{bad} mismatches")
