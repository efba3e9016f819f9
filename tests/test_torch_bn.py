"""TorchBatchNorm vs torch.nn.BatchNorm2d: exact training semantics.

The three reference BN backbones train through ``nn.BatchNorm2d``
(reference lib/network/mobilenet.py:10,25 etc.), whose running-variance
update uses the UNBIASED batch variance — flax's ``nn.BatchNorm`` stores
the biased one instead. These tests pin our drop-in
``models.layers.TorchBatchNorm`` to torch at the layer level:
train-mode forward, running-stat accumulation over several steps
(momentum 0.1 torch == 0.9 flax), eval-mode forward afterwards, and the
backward pass. The full-model/full-training twins live in
scripts/bn_train_parity.py (BN_TRAIN_PARITY.json).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_ekpose_tpu.models.layers import TorchBatchNorm

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.quick


def _pair(feat=6):
    tbn = torch.nn.BatchNorm2d(feat, eps=1e-5, momentum=0.1)
    torch.nn.init.normal_(tbn.weight, 1.0, 0.2)
    torch.nn.init.normal_(tbn.bias, 0.0, 0.2)
    ours = TorchBatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32)
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": {
            "mean": jnp.zeros(feat),
            "var": jnp.ones(feat),
        },
    }
    return tbn, ours, variables


def test_train_forward_and_running_stats_match_torch():
    rng = np.random.default_rng(0)
    tbn, ours, variables = _pair()
    tbn.train()
    for step in range(4):
        x = rng.normal(1.5, 2.0, (2, 6, 5, 7)).astype(np.float32)
        with torch.no_grad():
            y_t = tbn(torch.from_numpy(x)).numpy()
        y_o, updated = ours.apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
            mutable=["batch_stats"],
        )
        variables = {"params": variables["params"],
                     "batch_stats": updated["batch_stats"]}
        np.testing.assert_allclose(
            y_t.transpose(0, 2, 3, 1), np.asarray(y_o),
            rtol=1e-5, atol=1e-5,
        )
    np.testing.assert_allclose(
        tbn.running_mean.numpy(),
        np.asarray(variables["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6,
    )
    # the discriminating assertion: torch's running_var accumulates the
    # UNBIASED batch variance; flax's nn.BatchNorm would be off by
    # n/(n-1) = 70/69 here and fail this tolerance
    np.testing.assert_allclose(
        tbn.running_var.numpy(),
        np.asarray(variables["batch_stats"]["var"]), rtol=1e-5,
    )
    biased_would_be = np.asarray(variables["batch_stats"]["var"]) * 69 / 70
    assert not np.allclose(
        tbn.running_var.numpy(), biased_would_be, rtol=1e-4
    )


def test_eval_forward_uses_running_stats():
    rng = np.random.default_rng(1)
    tbn, ours, variables = _pair()
    tbn.train()
    x = rng.normal(0.5, 1.5, (2, 6, 5, 7)).astype(np.float32)
    with torch.no_grad():
        tbn(torch.from_numpy(x))
    _, updated = ours.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
        mutable=["batch_stats"],
    )
    variables = {"params": variables["params"],
                 "batch_stats": updated["batch_stats"]}

    tbn.eval()
    x2 = rng.normal(-0.3, 2.5, (3, 6, 5, 7)).astype(np.float32)
    with torch.no_grad():
        y_t = tbn(torch.from_numpy(x2)).numpy()
    eval_bn = TorchBatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)
    y_o = eval_bn.apply(variables, jnp.asarray(x2.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        y_t.transpose(0, 2, 3, 1), np.asarray(y_o), rtol=1e-5, atol=1e-5
    )


def test_train_backward_matches_torch():
    rng = np.random.default_rng(2)
    tbn, ours, variables = _pair()
    tbn.train()
    x = rng.normal(0.0, 1.0, (2, 6, 4, 4)).astype(np.float32)
    xt = torch.from_numpy(x).requires_grad_(True)
    tbn(xt).square().sum().backward()

    def loss_fn(params, xin):
        y, _ = ours.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]},
            xin, mutable=["batch_stats"],
        )
        return jnp.sum(jnp.square(y))

    grads, gx = jax.grad(loss_fn, argnums=(0, 1))(
        variables["params"], jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        xt.grad.numpy().transpose(0, 2, 3, 1), np.asarray(gx),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        tbn.weight.grad.numpy(), np.asarray(grads["scale"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        tbn.bias.grad.numpy(), np.asarray(grads["bias"]),
        rtol=1e-4, atol=1e-5,
    )
