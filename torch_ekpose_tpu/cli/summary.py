"""Model summary: parameter counts and XLA-estimated FLOPs per variant.

Equivalent of the reference's (broken) dev ``__main__`` block in its model
factory (reference lib/network/networks.py:70-136, which printed
thop/torchinfo summaries but passes kwargs ``get_model`` does not accept).

    python -m torch_ekpose_tpu.cli.summary            # all variants
    python -m torch_ekpose_tpu.cli.summary -m vgg2016 --size 368
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from torch_ekpose_tpu.models import MODEL_REGISTRY, get_model


def summarize(name: str, size: int) -> dict:
    model = get_model(name)
    x = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False), jax.random.PRNGKey(0), x
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
    )
    flops = None
    try:
        lowered = jax.jit(
            functools.partial(model.apply, train=False)
        ).lower(variables, x)
        cost = lowered.cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"])
    except Exception:
        pass
    return {"name": name, "params": n_params, "flops": flops}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-m", "--model", type=str, default=None)
    parser.add_argument("--size", type=int, default=368)
    args = parser.parse_args(argv)

    names = [args.model] if args.model else sorted(MODEL_REGISTRY)
    print(f"{'model':24s} {'params':>12s} {'GFLOPs':>10s}  (input {args.size})")
    for name in names:
        info = summarize(name, args.size)
        gflops = (
            f"{info['flops'] / 1e9:10.2f}" if info["flops"] else "       n/a"
        )
        print(f"{name:24s} {info['params']:12,d} {gflops}")


if __name__ == "__main__":
    main()
