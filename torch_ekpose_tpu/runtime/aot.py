"""AOT deployment artifacts: the serving pipeline as serialized StableHLO.

``export_pipeline`` bundles everything a serving process needs into ONE
file: the batched preprocess+forward program and the batched packed-decode
program (both lowered through :mod:`jax.export` to version-stable
StableHLO), the parameter tree, and the decode metadata. ``load_pipeline``
restores it and serves — **without the model-building code, flax, or a
checkpoint**: the artifact is the deployable unit, pinned to the exact
graph that was validated at export time.

The reference has no deployment story at all — its checkpoints are raw
``torch.save`` state_dicts consumed by the full training codebase
(reference train.py:207-218, estimator.py:22-42). This is the TPU-native
equivalent of a compiled model bundle: XLA recompiles the StableHLO for
the local chip at load time (once; the persistent compilation cache makes
restarts free), and jax's export calling convention guarantees the traced
graph — shapes, dtypes, decode thresholds, quantization — cannot drift
from what was exported.

Artifacts are platform-specific (the decode stage lowers to Mosaic TPU
kernels on TPU and to XLA loops elsewhere); the platform is recorded and
checked at load.

Container format (zip):
    meta.json           format/jax versions, model name, shapes, dtype,
                        platform, decode caps, preprocess mode
    variables.msgpack   parameter tree (flax msgpack; int8 trees included)
    forward.bin         jax.export serialization of
                        (variables, images[B,H,W,3] uint8) -> (paf, heatmap)
    decode.bin          jax.export serialization of
                        (heatmap, paf) -> packed [B, K] float32

Forward and decode stay two programs on purpose — identical to the
serving path (estimator.py ``_batch_decoder``): fusing the batched pair
into one XLA program sends optimization time off a cliff for no measured
win, and at load time that cost would return on every new machine.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from torch_ekpose_tpu.config import Config, get_default_config

FORMAT_VERSION = 1

__all__ = [
    "export_pipeline",
    "load_pipeline",
    "AotPipeline",
    "AotServingAdapter",
]


def _specs_like(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tree,
    )


def _serialize_exported(exported) -> bytes:
    return bytes(exported.serialize())


def _export(fun, *arg_specs, platform: str):
    """jax.export with the Mosaic safety valve.

    On TPU the decode programs contain ``tpu_custom_call`` (Pallas/Mosaic)
    custom calls, which jax.export refuses by default because their
    serialized form is only guaranteed against a compatible libtpu. A
    deployment artifact pins its platform anyway (meta.json), so that is
    the contract we want — disable exactly that check and no other.
    """
    from jax import export as jexport

    kwargs = {"platforms": (platform,)}
    try:
        return jexport.export(jax.jit(fun), **kwargs)(*arg_specs)
    except ValueError as e:
        if "custom_call" not in str(e).lower():
            raise
        kwargs["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        ]
        return jexport.export(jax.jit(fun), **kwargs)(*arg_specs)


def export_pipeline(
    estimator,
    path: str,
    batch: int,
    height: int,
    width: int,
    platform: Optional[str] = None,
) -> Dict[str, Any]:
    """Export a :class:`~torch_ekpose_tpu.runtime.estimator.PoseEstimator`'s
    batched serving pipeline (preprocess + forward, packed decode) for
    fixed ``[batch, height, width, 3]`` uint8 input. Returns the metadata
    dict that was written.

    ``height``/``width`` must be multiples of the model stride (the
    caller pads frames exactly as online serving does —
    ``runtime.estimator.padding``). ``platform`` defaults to the current
    default backend; the traced decode branch (Mosaic kernels vs XLA
    loops) follows the CURRENT backend, so exporting for a platform other
    than the one jax is running on is refused rather than miscompiled.
    """
    stride = estimator.config.MODEL.DOWNSAMPLE
    if height % stride or width % stride:
        raise ValueError(
            f"height/width must be multiples of the model stride "
            f"{stride}, got {height}x{width}"
        )
    backend = jax.default_backend()
    platform = platform or backend
    if platform != backend:
        raise ValueError(
            f"cannot export for platform {platform!r} while running on "
            f"{backend!r}: the decode program's kernel choice is made "
            f"for the running backend at trace time — run the export "
            f"on the target platform"
        )
    if getattr(estimator, "_needs_calib", False):
        raise ValueError(
            "int8_static estimator has no calibrated activation scales "
            "yet — calibrate() first (or export from a checkpoint "
            "written by cli.export --dtype int8_static)"
        )

    variables = estimator.variables
    var_specs = _specs_like(variables)
    img_spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.uint8)

    fwd = estimator._batch_forward_fn(height, width)
    paf_aval, heat_aval = jax.eval_shape(fwd, var_specs, img_spec)
    exp_fwd = _export(fwd, var_specs, img_spec, platform=platform)

    dec = estimator._batch_decoder()
    exp_dec = _export(
        dec,
        jax.ShapeDtypeStruct(heat_aval.shape, heat_aval.dtype),
        jax.ShapeDtypeStruct(paf_aval.shape, paf_aval.dtype),
        platform=platform,
    )

    from flax import serialization

    cfg = estimator.config
    meta = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "model": estimator.model_name,
        "preprocess": estimator.preprocess,
        "platform": platform,
        "batch": batch,
        "height": height,
        "width": width,
        "stride": stride,
        "max_peaks": cfg.DECODE.max_peaks_per_part,
        "subset_cap": cfg.DECODE.max_people * 3,
        "heatmap_shape": list(heat_aval.shape),
        "paf_shape": list(paf_aval.shape),
    }
    vars_np = jax.tree.map(np.asarray, variables)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        zf.writestr(
            "variables.msgpack", serialization.msgpack_serialize(vars_np)
        )
        zf.writestr("forward.bin", _serialize_exported(exp_fwd))
        zf.writestr("decode.bin", _serialize_exported(exp_dec))
    return meta


class AotPipeline:
    """A loaded deployment artifact: fixed-shape batched pose inference.

    ``estimate_batch(images)`` takes uint8 ``[B, H, W, 3]`` frames padded
    to the artifact's shape (pad smaller frames with
    :func:`runtime.estimator.padding`) and returns assembled
    :class:`~torch_ekpose_tpu.utils.human.Human` lists, exactly like
    ``PoseEstimator.estimate_batch``. ``packed(images)`` returns the raw
    on-device packed decode buffer for custom post-processing.
    """

    def __init__(self, meta: Dict[str, Any], variables, fwd, dec):
        self.meta = meta
        # commit once: deserialized artifacts hand us host arrays, and a
        # host leaf would be re-uploaded on every call (estimator.py has
        # the full story)
        self.variables = jax.device_put(variables)
        self._fwd = fwd
        self._dec = dec
        self.config: Config = get_default_config()
        self.config.DECODE.max_peaks_per_part = meta["max_peaks"]
        self.config.DECODE.max_people = meta["subset_cap"] // 3

    @property
    def batch(self) -> int:
        return self.meta["batch"]

    @property
    def input_shape(self):
        m = self.meta
        return (m["batch"], m["height"], m["width"], 3)

    def _check(self, images: np.ndarray) -> None:
        want = self.input_shape
        if tuple(images.shape) != want:
            raise ValueError(
                f"artifact expects input {want}, got "
                f"{tuple(images.shape)} — pad frames with "
                f"runtime.estimator.padding and batch to size "
                f"{want[0]}"
            )

    def packed(self, images: np.ndarray):
        self._check(images)
        paf, heatmap = self._fwd(self.variables, jnp.asarray(images))
        return self._dec(heatmap, paf)

    def estimate_batch(self, images: np.ndarray) -> List[List]:
        from torch_ekpose_tpu.decode import device as decode_device

        packed = self.packed(images)
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()  # bulk path; naive device_get is
            # ~100x slower through a high-latency link (EVAL_BREAKDOWN)
        packed = jax.device_get(packed)
        m = self.meta
        return [
            decode_device.packed_to_humans(
                packed[i], m["height"] // m["stride"],
                m["width"] // m["stride"], self.config,
            )
            for i in range(m["batch"])
        ]


class AotServingAdapter:
    """Adapts an :class:`AotPipeline` to the live-estimator serving
    surface (``runtime.server.PoseServer``): arbitrary BGR frames are
    letterboxed into the artifact's fixed ``[H, W]`` frame, and partial
    batches are zero-padded up to the artifact batch (the padded rows'
    results are dropped).

    ``scale`` keeps the reference's coordinate contract
    (``x_px = x_norm * W_pad / scale``, reference eval.py:110-111): it is
    the resize factor applied to the original frame, with the letterbox
    zero region part of the padded frame exactly like
    ``runtime.estimator.padding``'s to-multiple-of-8 margin.
    """

    def __init__(self, pipeline: AotPipeline):
        self.pipeline = pipeline
        self.config = pipeline.config
        m = pipeline.meta
        self.model_name = f"{m['model']} (AOT {m['platform']})"
        self.dest_size = max(m["height"], m["width"])

    def pad_image(self, image: np.ndarray):
        """Letterbox one BGR frame into the artifact frame.

        Returns (im_pad [H, W, 3] uint8, scale) with
        scale = min(H/h0, W/w0) — both dims always fit, unlike the
        long-side rule, because the artifact shape is fixed.
        """
        import cv2

        h, w = self.pipeline.meta["height"], self.pipeline.meta["width"]
        h0, w0 = image.shape[:2]
        scale = min(h / h0, w / w0)
        resized = cv2.resize(
            image, (0, 0), fx=scale, fy=scale,
            interpolation=cv2.INTER_CUBIC,
        )
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
        canvas[: resized.shape[0], : resized.shape[1]] = resized
        return canvas, scale

    def estimate_batch(self, images: np.ndarray) -> List[List]:
        b = self.pipeline.batch
        n = images.shape[0]
        if n > b:
            raise ValueError(
                f"batch {n} exceeds the artifact batch {b}"
            )
        if n < b:
            pad = np.zeros((b - n, *images.shape[1:]), images.dtype)
            images = np.concatenate([images, pad])
        return self.pipeline.estimate_batch(images)[:n]

    def estimate(self, image: np.ndarray):
        """(humans, scale) for one arbitrary BGR frame."""
        im_pad, scale = self.pad_image(image)
        return self.estimate_batch(im_pad[None])[0], scale


def load_pipeline(path: str) -> AotPipeline:
    """Load an artifact written by :func:`export_pipeline`."""
    from flax import serialization
    from jax import export as jexport

    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"unsupported artifact format "
                f"{meta.get('format_version')!r} (this build reads "
                f"{FORMAT_VERSION})"
            )
        backend = jax.default_backend()
        if meta["platform"] != backend:
            raise ValueError(
                f"artifact was exported for {meta['platform']!r} but "
                f"jax is running on {backend!r} — export per platform"
            )
        variables = serialization.msgpack_restore(
            zf.read("variables.msgpack")
        )
        exp_fwd = jexport.deserialize(bytearray(zf.read("forward.bin")))
        exp_dec = jexport.deserialize(bytearray(zf.read("decode.bin")))
    return AotPipeline(meta, variables, exp_fwd.call, exp_dec.call)
