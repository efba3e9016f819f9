"""Closed-loop sanity: overfit vgg2016 on one synthetic image, decode the
model's own predictions, and require the person to be recovered.

With --int8 the TRAINED weights are additionally quantized (both
serving flavors: dynamic and calibrated static activation scales) and
the same recovery bar is applied — an end-task accuracy check of the
int8 modes on real (if tiny) trained weights, beyond the cosine bound
the unit suite pins on random weights."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from torch_ekpose_tpu.models import init_model
from torch_ekpose_tpu.training import (
    create_train_state, make_optimizer, make_train_step,
)
from torch_ekpose_tpu.decode import paf_to_pose

S = 184
OFFSETS = np.array([
    (0, -48), (0, -35), (-13, -35), (-16, -18), (-18, 0), (13, -35),
    (16, -18), (18, 0), (-9, 0), (-10, 22), (-10, 45), (9, 0),
    (10, 22), (10, 45), (-4, -52), (4, -52), (-8, -50), (8, -50),
])
gt = np.zeros((1, 18, 3), dtype=np.float32)
gt[0, :, :2] = np.array([92, 100]) + OFFSETS
gt[0, :, 2] = 2

# render each joint as a distinct-colored disk so the image carries signal
img = np.zeros((S, S, 3), dtype=np.float32)
yy, xx = np.mgrid[0:S, 0:S]
rng = np.random.default_rng(0)
colors = rng.uniform(-1, 1, (18, 3))
for j in range(18):
    mask = (xx - gt[0, j, 0]) ** 2 + (yy - gt[0, j, 1]) ** 2 < 36
    img[mask] = colors[j]

model, variables = init_model('vgg2016', input_shape=(1, S, S, 3))
tx = make_optimizer(2e-4, 0.0)
state = create_train_state(model, variables, tx)
step = make_train_step(model, targets='device', grid=(S // 8, S // 8))

images = jnp.asarray(img[None])
kpts = jnp.asarray(gt[None])
t0 = time.time()
for i in range(400):
    state, logs = step(state, images, kpts)
    if i % 100 == 0:
        print(f'step {i} loss {float(logs["Loss"]):.1f}', flush=True)
print(f'trained in {time.time()-t0:.1f}s, final loss '
      f'{float(logs["Loss"]):.1f}', flush=True)

(paf, heat), _ = jax.jit(lambda v, x: model.apply(v, x, train=False))(
    {'params': state.params}, images)
humans = paf_to_pose(np.asarray(heat[0]), np.asarray(paf[0]))
print('decoded humans:', len(humans), flush=True)
assert len(humans) >= 1
h = max(humans, key=lambda hh: hh.part_count())
errs = []
for j, part in h.body_parts.items():
    ex = abs(part.x * S - gt[0, j, 0])
    ey = abs(part.y * S - gt[0, j, 1])
    errs.append(max(ex, ey))
print(f'parts {h.part_count()}/18, max err {max(errs):.1f}px, '
      f'mean err {np.mean(errs):.1f}px', flush=True)
assert h.part_count() >= 14
assert np.mean(errs) < 8.0
print('OVERFIT CLOSED-LOOP OK', flush=True)


def check_quantized(quantize):
    from torch_ekpose_tpu.models import (
        calibrate_act_scales, get_model, quantize_variables,
    )

    dyn_qmodel = get_model('vgg2016', dtype=jnp.bfloat16, quantize=True)
    qvars = quantize_variables({'params': state.params}, dyn_qmodel)
    if quantize == 'static':
        qmodel = get_model('vgg2016', dtype=jnp.bfloat16, quantize='static')
        qvars = calibrate_act_scales(
            qvars, dyn_qmodel, [images.astype(jnp.bfloat16)]
        )
    else:
        qmodel = dyn_qmodel
    (qpaf, qheat), _ = jax.jit(
        lambda v, x: qmodel.apply(v, x, train=False)
    )(qvars, images.astype(jnp.bfloat16))
    qhumans = paf_to_pose(
        np.asarray(qheat[0], np.float32), np.asarray(qpaf[0], np.float32)
    )
    assert len(qhumans) >= 1, f'int8[{quantize}] lost the person'
    qh = max(qhumans, key=lambda hh: hh.part_count())
    qerrs = [
        max(abs(p.x * S - gt[0, j, 0]), abs(p.y * S - gt[0, j, 1]))
        for j, p in qh.body_parts.items()
    ]
    print(f'int8[{quantize}]: parts {qh.part_count()}/18, '
          f'max err {max(qerrs):.1f}px, mean {np.mean(qerrs):.1f}px',
          flush=True)
    assert qh.part_count() >= 14
    assert np.mean(qerrs) < 8.0


if '--int8' in sys.argv:
    check_quantized(True)
    check_quantized('static')
    print('INT8 CLOSED-LOOP OK', flush=True)
