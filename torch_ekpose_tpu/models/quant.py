"""Int8 quantized inference ("int8 serving mode").

Post-training dynamic quantization for the dense-conv (vgg) model
family: per-output-channel int8 weights with float32 scales, and a
per-tensor activation scale computed on the fly inside the jitted
program. Convolutions run as int8 x int8 -> int32
(``preferred_element_type=jnp.int32``), which XLA can place on the TPU
MXU's int8 path — v5e's int8 peak is 2x its bf16 peak — and which
halves weight HBM traffic versus bf16.

Following standard post-training-quantization practice, the network's
first convolution and each branch's final 1x1 projection stay in the
bfloat16 path: the input conv is a negligible share of the FLOPs and
the projections set the decoded peak values directly.

Two activation-scale modes:

- **dynamic** (``get_model(..., quantize=True)``): per-example scale
  ``max|x|/127`` computed inside the program. No calibration needed,
  but every conv serializes behind a full-tensor reduction — at batch 1
  the reductions dominate and throughput collapses (46 vs 299 bf16 fps
  on v5e, docs/PERF.md).
- **static** (``get_model(..., quantize="static")``): per-layer scalar
  ``act_scale`` parameters measured once on representative inputs by
  :func:`calibrate_act_scales` (standard post-training calibration).
  No reductions in the serving program. Out-of-calibration-range
  activations clip, so calibrate on data matching production traffic.

The reference has no quantized path at all (its serving story is the
fp32 torch model, lib/evaluate/estimator.py); this mode is
beyond-parity. Scope: the "vgg" branch/backbone family (vgg2016). The
depthwise-separable family is dominated by BN-folded pointwise convs
and stays bf16 (``get_model(..., quantize=True)`` rejects it).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from torch_ekpose_tpu.models.layers import Dtype

__all__ = [
    "QuantAcc",
    "QuantConv",
    "calibrate_act_scales",
    "has_act_scales",
    "quantize_variables",
    "realize",
]


@flax.struct.dataclass
class QuantAcc:
    """Deferred output of a static-scale quantized conv — the folded
    integer pipeline record.

    Instead of materializing bf16 activations after every conv (int32
    accumulator -> dequantize -> relu -> bf16 write, then the NEXT conv
    reads them back and re-quantizes to s8 — three full-tensor
    elementwise passes per edge), a static QuantConv returns the raw
    int32 MXU accumulator plus the per-channel affine that maps it to
    real activations. The consumer folds dequantize + bias + relu +
    its own requantize into ONE int32 -> s8 elementwise pass in its own
    activation scale (the classic integer-inference pipeline). Per
    conv->conv edge this cuts the elementwise HBM traffic from
    4+2 + 2+1 bytes/element to 4+1 (docs/PERF.md measured the unfolded
    chains at ~1.5 ms of the 11.8 ms int8_static batch-8 forward).

    ``relu`` is deferred too: it is monotone, so it folds into the
    consumer's clip-low bound. Max pools are deferred the same way
    (``pools``): the whole int32 -> s8 requantize (positive per-channel
    scale, round, clip) is monotone non-decreasing, so it commutes with
    max — the consumer requantizes FIRST and then pools 1-byte int8
    data instead of 4-byte accumulators or 2-byte bf16 activations.
    The three VGG prefix pools sit on the largest tensors in the
    network, so this halves their edge traffic vs the bf16 pipeline
    (measured: pooling the raw int32 accumulator instead was a net
    LOSS — reduce-window can't deduplicate the 4-byte materialization).
    """

    acc: jnp.ndarray  # int32 [N, H, W, C] conv accumulator
    mult: jnp.ndarray  # float32 [C]: act_scale * per-channel weight scale
    bias: Optional[jnp.ndarray]  # float32 [C] or None
    relu: bool = flax.struct.field(pytree_node=False, default=False)
    #: deferred max pools, applied AFTER requantize/realize: tuple of
    #: (window, stride, padding) in application order
    pools: tuple = flax.struct.field(pytree_node=False, default=())

    @property
    def shape(self):
        n, h, w, c = self.acc.shape
        for window, stride, padding in self.pools:
            h = (h + 2 * padding - window) // stride + 1
            w = (w + 2 * padding - window) // stride + 1
        return (n, h, w, c)


def _apply_pools(y, pools, *, pad_value):
    """Run the deferred max pools. ``pad_value`` must be the domain's
    minimum (identity of max): -128 for int8, -inf for floats."""
    import jax.lax as lax

    for window, stride, padding in pools:
        if padding:
            cfg = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
        else:
            cfg = [(0, 0)] * 4
        y = lax.reduce_window(
            y, jnp.asarray(pad_value, y.dtype), lax.max,
            (1, window, window, 1), (1, stride, stride, 1), cfg,
        )
    return y


def realize(x, dtype):
    """Materialize a :class:`QuantAcc` as real activations in ``dtype``
    (one fused dequantize+bias+relu pass). Non-records pass through —
    safe to call at every chain boundary."""
    if not isinstance(x, QuantAcc):
        return x
    y = x.acc.astype(jnp.float32) * x.mult
    if x.bias is not None:
        y = y + x.bias
    if x.relu:
        y = jnp.maximum(y, 0.0)
    y = _apply_pools(y, x.pools, pad_value=-jnp.inf)
    return y.astype(dtype)


#: multiply by the f32 reciprocal instead of dividing by 127: XLA's
#: optimizer rewrites /const into *(1/const) inside large fused
#: programs, so an explicit reciprocal is the only way the host-numpy
#: and device-jit conversion paths produce bitwise-identical scales
_INV127 = np.float32(1.0 / 127.0)


def quantize_kernel(kernel):
    """Per-output-channel symmetric int8 quantization of an
    [H, W, Cin, Cout] conv kernel -> (int8 kernel, float32 [Cout] scale).
    Works on numpy or jax arrays (traceable)."""
    xp = np if isinstance(kernel, np.ndarray) else jnp
    k = kernel.astype(xp.float32)
    scale = xp.max(xp.abs(k), axis=(0, 1, 2)) * _INV127
    scale = xp.maximum(scale, 1e-12)  # all-zero channels divide safely
    q = xp.clip(xp.round(k / scale), -127, 127).astype(xp.int8)
    return q, scale.astype(xp.float32)


class QuantConv(nn.Module):
    """Drop-in conv whose weights are stored int8.

    Parameters: ``kernel_q`` int8 [H, W, Cin, Cout], ``scale`` float32
    [Cout], optional ``bias`` float32 [Cout]. The activation scale is
    dynamic per tensor by default: ``sx = max|x| / 127`` computed inside
    the same XLA program (one VPU reduction, fused). With
    ``static_act=True`` the scale is instead a calibrated scalar
    parameter ``act_scale`` (see :func:`calibrate_act_scales`) and the
    program has no reduction. Accumulation is int32; the result is
    rescaled by ``sx * scale`` in float32 and cast to ``dtype``.

    With ``fold=True`` (requires ``static_act``) the raw accumulator is
    instead returned as a :class:`QuantAcc` record (the classic folded
    integer pipeline) — consumers are either another folded QuantConv
    (which fuses dequant+relu+requant into one int32 -> s8 pass) or
    :func:`realize`. Measured a NET LOSS on v5e vs the default path
    (XLA already emits the dequant->requant chain as one fusion; see
    docs/PERF.md) — kept as an opt-in tested negative result.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    static_act: bool = False
    fold: bool = False

    @nn.compact
    def __call__(self, x):
        if isinstance(x, QuantAcc) and not (self.static_act and self.fold):
            raise TypeError(
                "QuantAcc records only flow between folded QuantConvs"
            )
        if self.fold and not self.static_act:
            raise ValueError("fold=True requires static_act=True")
        in_features = x.shape[-1]
        kshape = (self.kernel, self.kernel, in_features, self.features)
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros, kshape, jnp.int8
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        if self.static_act:
            # calibrated per-layer scalar: no reduction in the serving
            # program (the dynamic max|x| reduction serializes every
            # conv and dominates small/batch-1 programs)
            act_scale = self.param(
                "act_scale", nn.initializers.ones, (), jnp.float32
            )
            sx = jnp.maximum(act_scale, 1e-12)
            if isinstance(x, QuantAcc):
                # folded edge: the producer's dequant+bias+relu and our
                # requantize collapse into ONE int32 -> s8 pass in our
                # scale. relu (values >= 0) becomes the clip-low bound,
                # and deferred max pools run AFTER the requantize on
                # 1-byte data (the requantize is monotone per channel,
                # so max commutes with it exactly).
                y = x.acc.astype(jnp.float32) * (x.mult / sx)
                if x.bias is not None:
                    y = y + x.bias / sx
                lo = 0.0 if x.relu else -127.0
                xq = jnp.clip(jnp.round(y), lo, 127.0).astype(jnp.int8)
                xq = _apply_pools(xq, x.pools, pad_value=-128)
            else:
                xf = x.astype(jnp.float32)
                xq = jnp.clip(
                    jnp.round(xf / sx), -127, 127
                ).astype(jnp.int8)
        else:
            xf = x.astype(jnp.float32)
            # per-EXAMPLE activation scale (reduce over H, W, C only):
            # batched and batch-1 paths then produce identical values
            # for the same image, so eval results don't depend on
            # bucketing/batch size
            sx = jnp.max(
                jnp.abs(xf), axis=tuple(range(1, x.ndim)), keepdims=True
            ) / 127.0
            sx = jnp.maximum(sx, 1e-12)
            # calibration hook: max|x| over the batch, recorded only when
            # apply() is called with mutable=["intermediates"]
            self.sow("intermediates", "act_absmax", jnp.max(sx) * 127.0)
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq,
            kernel_q,
            (self.stride, self.stride),
            [(self.kernel // 2, self.kernel // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        if self.fold:
            # defer dequantization: hand the consumer the accumulator +
            # affine; a trailing ConvBlock relu sets the record's flag
            return QuantAcc(acc=y, mult=sx * scale, bias=bias, relu=False)
        y = y.astype(jnp.float32) * (sx * scale)  # sx broadcasts [N,1,1,1]
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def _quantize_tree(src, tgt_struct):
    """Rebuild ``src`` (float param tree) in the shape of ``tgt_struct``
    (the quantized model's param structure from ``jax.eval_shape``):
    wherever the target expects ``kernel_q``/``scale``, quantize the
    source's ``kernel``; everything else passes through unchanged."""
    if isinstance(tgt_struct, dict) and "kernel_q" in tgt_struct:
        if "kernel_q" in src:  # already quantized (saved int8 ckpt)
            out = dict(src)
        else:
            q, scale = quantize_kernel(src["kernel"])
            out = {"kernel_q": q, "scale": scale}
            if "bias" in tgt_struct:
                out["bias"] = src["bias"]
        if "act_scale" in tgt_struct and "act_scale" not in out:
            # static-scale model from an uncalibrated source: placeholder
            # until calibrate_act_scales() measures the real value
            out["act_scale"] = np.ones((), np.float32)
        if "act_scale" in out and "act_scale" not in tgt_struct:
            # calibrated (static) checkpoint loaded into the dynamic model
            out.pop("act_scale")
        return out
    if isinstance(tgt_struct, dict):
        return {k: _quantize_tree(src[k], v) for k, v in tgt_struct.items()}
    return src


def quantize_variables(
    variables: Dict, quant_model, input_shape=(1, 64, 64, 3)
) -> Dict:
    """Convert a float variables tree into ``quant_model``'s quantized
    tree. The target structure comes from ``jax.eval_shape`` (no
    compute, no memory); the transform itself runs as ONE jitted
    program for device trees (mirroring
    :func:`torch_ekpose_tpu.models.cast_params` — no host round-trip of
    the ~200 MB vgg tree through a slow device tunnel) or in numpy for
    host trees.
    """
    tgt = jax.eval_shape(
        functools.partial(quant_model.init, train=False),
        jax.random.PRNGKey(0),
        jnp.zeros(input_shape, jnp.bfloat16),
    )
    tgt_params = _plain_dict(tgt["params"])
    params = variables["params"]
    if all(
        isinstance(leaf, np.ndarray) for leaf in jax.tree.leaves(params)
    ):
        new_params = _quantize_tree(_plain_dict(params), tgt_params)
    else:
        new_params = jax.jit(
            lambda p: _quantize_tree(p, tgt_params)
        )(_plain_dict(params))
    out = dict(variables)
    out["params"] = new_params
    return out


def _plain_dict(tree: Any):
    """FrozenDict/dict -> plain nested dict (leaves untouched)."""
    if hasattr(tree, "items"):
        return {k: _plain_dict(v) for k, v in tree.items()}
    return tree


def has_act_scales(params: Any) -> bool:
    """True if any quantized conv in ``params`` carries a calibrated
    ``act_scale`` (i.e. the tree belongs to the static-scale model)."""
    if isinstance(params, dict) or hasattr(params, "items"):
        return any(
            k == "act_scale" or has_act_scales(v) for k, v in params.items()
        )
    return False


def _strip_act_scales(params):
    """Drop ``act_scale`` leaves so a static-model tree applies cleanly
    through the dynamic model (used during calibration)."""
    if isinstance(params, dict):
        return {
            k: _strip_act_scales(v)
            for k, v in params.items()
            if k != "act_scale"
        }
    return params


def _insert_act_scales(params, absmax):
    """Write ``act_scale = max(absmax/127, 1e-12)`` into every quantized
    conv of ``params``; ``absmax`` is the collected intermediates tree
    (module paths parallel the param paths)."""
    if isinstance(params, dict) and "kernel_q" in params:
        out = dict(params)
        # jnp, not np: a numpy leaf would make the calibrated tree
        # host-mixed, and jit re-uploads every host leaf on EVERY call —
        # ~80 per-call DevicePuts through the device link was the real
        # cause of the "int8_static batch-1 collapse" (46/83 fps; the
        # traced device time of that program is ~2.2 ms ≈ 450 fps)
        out["act_scale"] = jnp.asarray(
            max(float(absmax["act_absmax"]) / 127.0, 1e-12), jnp.float32
        )
        return out
    if isinstance(params, dict):
        return {
            k: _insert_act_scales(v, absmax[k]) if k in absmax else v
            for k, v in params.items()
        }
    return params


def calibrate_act_scales(variables: Dict, dyn_model, inputs) -> Dict:
    """Measure static activation scales (post-training calibration).

    Runs the DYNAMIC quantized model (``get_model(..., quantize=True)``)
    over ``inputs`` — an iterable of already-preprocessed model input
    batches [B, H, W, 3] — collecting each quantized conv's observed
    ``max|x|`` via flax intermediates, reduced with max across batches.
    Returns a copy of ``variables`` with per-layer ``act_scale`` leaves
    (host f32 scalars; only scalars cross the device link) ready for the
    static model (``get_model(..., quantize="static")``).

    ``variables`` may be the dynamic tree or a static tree with
    placeholder scales; any existing ``act_scale`` values are recomputed.
    """
    params = _plain_dict(variables["params"])
    calib_vars = dict(variables)
    calib_vars["params"] = _strip_act_scales(params)

    @jax.jit
    def run(v, x):
        _, updates = dyn_model.apply(
            v, x, train=False, mutable=["intermediates"]
        )
        # sow() appends into 1-tuples; unwrap to plain scalars
        return jax.tree.map(
            lambda t: t[0],
            updates["intermediates"],
            is_leaf=lambda t: isinstance(t, tuple),
        )

    absmax = None
    for x in inputs:
        cur = run(calib_vars, jnp.asarray(x))
        absmax = (
            cur if absmax is None else jax.tree.map(jnp.maximum, absmax, cur)
        )
    if absmax is None:
        raise ValueError("calibration needs at least one input batch")
    absmax = jax.device_get(_plain_dict(absmax))
    out = dict(variables)
    out["params"] = _insert_act_scales(params, absmax)
    return out
