import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""TPU-side device-vs-oracle decode parity on synthetic multi-person scenes
(the same generator bench.py uses for its per-run certification)."""
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from torch_ekpose_tpu.config import get_default_config
from torch_ekpose_tpu.decode import device as D, oracle
from torch_ekpose_tpu.decode.synthetic import canonical_humans as canon
from torch_ekpose_tpu.decode.synthetic import synth_scene

cfg = get_default_config()
rng = np.random.default_rng(42)
H, W = 46, 54

dec = D.build_decoder(cfg)
scenes = [synth_scene(rng, int(rng.integers(1, 5)), H, W) for _ in range(8)]
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
