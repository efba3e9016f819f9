import time, numpy as np
import jax, jax.numpy as jnp
from torch_ekpose_tpu.models import init_model, get_model
from torch_ekpose_tpu.training import create_train_state, make_optimizer, make_train_step

S = 368
for B in (4, 8):
    model, variables = init_model('vgg2016', input_shape=(1, S, S, 3))
    tx = make_optimizer(1e-4, 5e-4)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, targets='device', grid=(S//8, S//8))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0,1,(B,S,S,3)).astype(np.float32))
    kpts = np.zeros((B,8,18,3), dtype=np.float32)
    kpts[:, :2, :, 0] = rng.uniform(20, S-20, (B,2,18))
    kpts[:, :2, :, 1] = rng.uniform(20, S-20, (B,2,18))
    kpts[:, :2, :, 2] = 2
    kpts = jnp.asarray(kpts)
    t0 = time.time()
    state, logs = step(state, images, kpts)
    _ = float(logs['Loss'])  # real fetch: block_until_ready can return early on the tunneled platform
    print(f'B={B} compile+first {time.time()-t0:.1f}s', flush=True)
    t0 = time.time(); n = 10
    for _ in range(n):
        state, logs = step(state, images, kpts)
    _ = float(logs['Loss'])  # real fetch: block_until_ready can return early on the tunneled platform
    dt = (time.time()-t0)/n
    print(f'B={B} step {dt*1000:.1f} ms -> {B/dt:.1f} img/s', flush=True)
