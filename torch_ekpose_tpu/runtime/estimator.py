"""Inference runtime: padding, device-side preprocessing, and a
shape-bucketed jitted estimator.

Equivalent of the reference inference runtime (reference
lib/evaluate/estimator.py): ``padding`` resizes the long side to
``dest_size`` and zero-pads to a stride multiple (:45-68), ``get_outputs``
preprocesses, runs the model, and returns stage-6 PAF/heatmaps (:71-88).

TPU-native differences:

- preprocessing (scale / BGR->RGB / imagenet normalize — reference
  lib/datasets/preprocessing.py:16-43) happens **inside the jitted
  program** on device, fused with the first convolution by XLA;
- tensors stay NHWC end to end (no CHW transposes);
- one compiled executable per padded input shape, cached — callers that
  keep a fixed resolution (video/webcam) compile exactly once;
- ``estimate_fused`` runs forward + full pose decode as a single XLA
  program, so streaming inference never round-trips to the host between
  the convs and the assembled people.
"""

from __future__ import annotations

import contextlib
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.config import Config, cfg as default_cfg
from torch_ekpose_tpu.decode import api as decode_api
from torch_ekpose_tpu.decode import device as decode_device
from torch_ekpose_tpu.models import (
    calibrate_act_scales,
    cast_params,
    get_model,
    has_act_scales,
    init_model,
    quantize_variables,
)
from torch_ekpose_tpu.ops.resize import resize_image_np
from torch_ekpose_tpu.utils.human import Human

__all__ = ["padding", "preprocess_jax", "matmul_precision", "PoseEstimator"]


def matmul_precision(precision: str):
    """Context manager mapping the serving precision knob onto XLA.

    TPU MXUs multiply in bfloat16 even for float32 operands at the
    DEFAULT precision — fast, but it makes every conv/dot carry ~3e-3
    relative noise, which is where the measured config-to-config AP
    spread on the serving platform came from (PERF.md "Serving
    numerics"). ``"highest"`` traces every conv/dot at
    ``jax.lax.Precision.HIGHEST`` (multi-pass true-f32 multiplies on the
    MXU), restoring CPU-grade determinism; ``"fast"`` keeps the default.
    The reference's torch-CPU forward is always full f32
    (reference lib/evaluate/estimator.py:71-88), so ``highest`` is the
    mode whose numbers transfer 1:1 to the CPU parity gates.

    The jax config var participates in jit cache keys, so wrapping a
    call site of an already-jitted function is sufficient and caches
    correctly per precision.
    """
    if precision == "highest":
        return jax.default_matmul_precision("highest")
    if precision != "fast":
        raise ValueError(f"precision must be 'fast' or 'highest', got {precision!r}")
    return contextlib.nullcontext()


def _factor_closest(num: float, factor: int, is_ceil: bool = True) -> int:
    fn = np.ceil if is_ceil else np.floor
    return int(fn(float(num) / factor)) * factor


def padding(
    im: np.ndarray, dest_size: int = 368, factor: int = 8,
    is_ceil: bool = True,
) -> Tuple[np.ndarray, float, Tuple[int, int, int]]:
    """Resize the long side to ``dest_size`` and zero-pad H/W up to
    multiples of ``factor`` (reference estimator.py:52-68).

    Uses cv2 for the resize when available (bit-parity with the
    reference's uint8 fixed-point path), falling back to our float
    bilinear otherwise.
    """
    im_scale = float(dest_size) / np.max(im.shape[0:2])
    new_w = int(np.rint(im.shape[1] * im_scale))
    new_h = int(np.rint(im.shape[0] * im_scale))
    try:
        import cv2

        # fx/fy form, NOT dsize: cv2 maps output coords through the
        # GIVEN factors, so resize(im, (new_w, new_h)) produces different
        # pixels whenever rint(w*s)/w != s — the reference passes fx/fy
        # (estimator.py:60) and bit-parity requires the same call
        im = cv2.resize(im, None, fx=im_scale, fy=im_scale)
    except ImportError:
        resized = resize_image_np(im.astype(np.float32), new_h, new_w, "linear")
        im = (
            np.clip(np.rint(resized), 0, 255).astype(im.dtype)
            if np.issubdtype(im.dtype, np.integer) else resized
        )

    h, w, c = im.shape
    im_pad = np.zeros(
        [_factor_closest(h, factor, is_ceil),
         _factor_closest(w, factor, is_ceil), c],
        dtype=im.dtype,
    )
    im_pad[0:h, 0:w, :] = im
    return im_pad, im_scale, im.shape


def preprocess_jax(image: jax.Array, mode: str = "vgg") -> jax.Array:
    """Device-side preprocessing of a [H, W, 3] BGR image (any dtype).

    - ``"vgg"``: /255, BGR->RGB, imagenet mean/std
      (reference preprocessing.py:32-43);
    - ``"rtpose"``: /256 - 0.5 (reference preprocessing.py:16-21).
    Output stays HWC float32.
    """
    x = image.astype(jnp.float32)
    if mode == "vgg":
        x = x[..., ::-1] / 255.0
        mean = jnp.asarray(constants.IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(constants.IMAGENET_STD, jnp.float32)
        return (x - mean) / std
    if mode == "rtpose":
        return x / 256.0 - 0.5
    raise ValueError(f"unknown preprocess mode {mode!r}")


class PoseEstimator:
    """Owns a model + parameters and serves pose inference.

    ``estimate(image)`` is the one-call equivalent of the reference's
    ``get_outputs`` + ``paf_to_pose_cpp`` chain (reference eval.py:153-156).
    """

    def __init__(
        self,
        model_name: str = "vgg2016",
        variables: Optional[Dict] = None,
        config: Optional[Config] = None,
        preprocess: str = "vgg",
        decode_backend: str = "auto",
        dest_size: int = 368,
        compute_dtype=jnp.bfloat16,
        fuse_decode: bool = True,
        s2d_blocks: int = 0,
        precision: str = "fast",
    ):
        self.config = config or default_cfg
        self.model_name = model_name
        self.preprocess = preprocess
        self.decode_backend = decode_backend
        self.dest_size = dest_size
        #: "fast" (default MXU precision) or "highest" (true-f32 conv/dot
        #: multiplies — see matmul_precision). "highest" only changes
        #: numerics when compute_dtype is float32.
        matmul_precision(precision)  # validate eagerly
        self.precision = precision
        self._needs_calib = False
        self._calib_model = None
        if compute_dtype in ("int8", "int8_static"):
            # int8 serving mode: int8 weights, bf16 everywhere else
            # (models/quant.py). Weight HBM traffic halves vs bf16 and
            # the convs can ride the MXU's 2x int8 path. "int8" computes
            # activation scales dynamically per example; "int8_static"
            # uses calibrated per-layer scales (no reductions — the fast
            # batch-1 path), measured by calibrate() or automatically on
            # the first frame served.
            static = compute_dtype == "int8_static"
            self.model = get_model(
                model_name, dtype=jnp.bfloat16,
                quantize="static" if static else True,
                s2d_blocks=s2d_blocks,  # raises on the conflict rather
                # than silently dropping the user's s2d request
            )
            if variables is None:
                _, variables = init_model(
                    model_name, input_shape=(1, 64, 64, 3),
                    dtype=jnp.bfloat16,
                )
            # a tree that already carries act_scale leaves is a
            # calibrated static checkpoint (cli.export --dtype
            # int8_static) — don't re-calibrate on arbitrary first frames
            already_calibrated = has_act_scales(variables.get("params", {}))
            variables = quantize_variables(variables, self.model)
            if static:
                self._calib_model = get_model(
                    model_name, dtype=jnp.bfloat16, quantize=True
                )
                self._needs_calib = not already_calibrated
        else:
            # s2d_blocks routes the first N VGG19 blocks through the
            # weight-exact space-to-depth decomposition (ops/s2d_conv.py);
            # the parameter tree is identical, so checkpoints are
            # unaffected. vgg family only.
            self.model = get_model(
                model_name, dtype=compute_dtype, s2d_blocks=s2d_blocks
            )
            if variables is None:
                _, variables = init_model(
                    model_name, input_shape=(1, 64, 64, 3),
                    dtype=compute_dtype,
                )
            if compute_dtype != jnp.float32:
                # store weights in the compute dtype: halves weight
                # streaming (the dominant HBM traffic at batch 1) and
                # drops per-call casts
                variables = cast_params(variables, compute_dtype)
        # Commit the tree to the default device ONCE. jit does not cache
        # host (numpy) arguments — every call re-uploads each host leaf,
        # and a converted checkpoint (numpy tree) or a calibrated int8
        # tree with host scalars then pays per-call DevicePuts through
        # the device link (~80 puts/call was the measured cause of the
        # int8_static batch-1 collapse). Already-device leaves alias for
        # free.
        self.variables = jax.device_put(variables)
        #: Compile forward+decode as ONE XLA program (default). The merged
        #: program avoids the inter-program device copy of the paf/heatmap
        #: buffers; since the decoder's gathers became one-hot contractions
        #: it also compiles in seconds rather than minutes. Set False to
        #: chain two cached executables instead (useful when many input
        #: shapes would each pay the fused compile).
        self.fuse_decode = fuse_decode
        self._forward_cache: Dict[Tuple[int, int], any] = {}
        self._fused_cache: Dict[Tuple[int, int], any] = {}
        self._decoder = None
        self._vmapped_decoder = None

    # -- static int8 calibration ------------------------------------------

    def calibrate(self, image_batches) -> None:
        """Measure static int8 activation scales (``int8_static`` mode)
        on representative PADDED images — an iterable of [H, W, 3] or
        [B, H, W, 3] uint8/float arrays. Standard post-training
        calibration: each quantized conv's scale becomes the max |input|
        observed across all batches / 127 (models/quant.py). Called
        automatically with the first served frame if never invoked;
        calibrate explicitly on production-like frames for best accuracy.
        """
        if self._calib_model is None:
            raise RuntimeError(
                "calibrate() applies to compute_dtype='int8_static' only"
            )
        mode = self.preprocess
        # one jitted preprocess shared by every batch: same-shape
        # calibration frames then hit the compile cache instead of
        # retracing per batch
        prep = jax.jit(jax.vmap(lambda im: preprocess_jax(im, mode)))

        def inputs():
            for imgs in image_batches:
                arr = jnp.asarray(imgs)
                if arr.ndim == 3:
                    arr = arr[None]
                yield prep(arr)

        self.variables = jax.device_put(calibrate_act_scales(
            self.variables, self._calib_model, inputs()
        ))
        self._needs_calib = False

    def _maybe_calibrate(self, images: np.ndarray) -> None:
        if self._needs_calib:
            self.calibrate([images])

    # -- compiled program builders (one per padded input shape) ----------

    def _forward_fn(self, h: int, w: int):
        key = (h, w)
        if key not in self._forward_cache:
            mode = self.preprocess

            @jax.jit
            def fwd(variables, image):
                with matmul_precision(self.precision):
                    x = preprocess_jax(image, mode)[None]
                    (paf, heatmap), _ = self.model.apply(
                        variables, x, train=False
                    )
                    return (
                        paf[0].astype(jnp.float32),
                        heatmap[0].astype(jnp.float32),
                    )

            self._forward_cache[key] = fwd
        return self._forward_cache[key]

    def _fused_fn(self, h: int, w: int):
        key = (h, w)
        if key not in self._fused_cache:
            mode = self.preprocess
            decoder = decode_device.build_decoder(self.config)

            @jax.jit
            def fused(variables, image):
                with matmul_precision(self.precision):
                    x = preprocess_jax(image, mode)[None]
                    (paf, heatmap), _ = self.model.apply(
                        variables, x, train=False
                    )
                    paf = paf[0].astype(jnp.float32)
                    heatmap = heatmap[0].astype(jnp.float32)
                    # packed: ONE host fetch per frame instead of five
                    return decode_device.pack_result(decoder(heatmap, paf))

            self._fused_cache[key] = fused
        return self._fused_cache[key]

    def _batch_decoder(self):
        # batched decode stays a SEPARATE cached executable from the
        # batched forward: fusing them into one program sends XLA's
        # optimization passes off a cliff (minutes vs ~8s + ~6s), while
        # chaining costs almost nothing — the paf/heatmap buffers pass
        # device-to-device
        if self._vmapped_decoder is None:
            raw = decode_device.build_packed_decoder(
                self.config, batched=True
            )
            # call-site precision wrap: the config var participates in
            # jit cache keys, so this traces (and caches) the decoder's
            # one-hot contractions at the requested precision
            def dec(heatmap, paf, _raw=raw, _p=self.precision):
                with matmul_precision(_p):
                    return _raw(heatmap, paf)

            self._vmapped_decoder = dec
        return self._vmapped_decoder

    def _batch_forward_fn(self, h: int, w: int):
        key = ("batch", h, w)
        if key not in self._forward_cache:
            mode = self.preprocess

            @jax.jit
            def fwd(variables, images):
                with matmul_precision(self.precision):
                    x = jax.vmap(
                        lambda im: preprocess_jax(im, mode)
                    )(images)
                    (paf, heatmap), _ = self.model.apply(
                        variables, x, train=False
                    )
                    return (
                        paf.astype(jnp.float32),
                        heatmap.astype(jnp.float32),
                    )

            self._forward_cache[key] = fwd
        return self._forward_cache[key]

    # -- public API -------------------------------------------------------

    def get_outputs_batch(self, images: np.ndarray):
        """Batched forward over same-shape padded images [B, H, W, 3] ->
        (pafs [B, h, w, 38], heatmaps [B, h, w, 19]). The reference
        evaluates strictly batch-1 (reference eval.py:144-156); batching
        same-shape buckets is the TPU-native eval path."""
        self._maybe_calibrate(images)
        fwd = self._batch_forward_fn(*images.shape[1:3])
        paf, heatmap = fwd(self.variables, jnp.asarray(images))
        return np.asarray(paf), np.asarray(heatmap)

    def estimate_batch(
        self, images: np.ndarray
    ) -> List[List[Human]]:
        """Assembled people for a batch of same-shape padded images
        [B, H, W, 3]: batched forward + vmapped on-device decode as one
        XLA program; only fixed-shape DecodeResults return to the host.
        This is the high-throughput eval/video path — the reference
        decodes strictly one image at a time on the CPU
        (reference eval.py:144-156)."""
        return self.collect_batch(self.estimate_batch_async(images))

    def estimate_batch_async(self, images: np.ndarray):
        """Dispatch a batch without blocking; returns a handle for
        ``collect_batch``. Keeping one batch in flight overlaps the next
        batch's host->device transfer and compute with the previous
        batch's readback and host-side drawing/encoding (the streaming
        video path does this)."""
        self._maybe_calibrate(images)
        b, h, w = images.shape[:3]
        fwd = self._batch_forward_fn(h, w)
        paf, heatmap = fwd(self.variables, jnp.asarray(images))
        packed = self._batch_decoder()(heatmap, paf)
        # start the device->host DMA for every result leaf NOW (it
        # enqueues behind the decode, non-blocking): by the time
        # collect_batch runs, later batches' compute has overlapped this
        # batch's readback instead of serializing behind it — on a
        # high-latency device link this is most of the eval-loop gap to
        # the streaming bench (PERF.md "Eval loop decomposition")
        for leaf in jax.tree.leaves(packed):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        return packed, b, h, w

    def collect_batch(self, handle) -> List[List[Human]]:
        """Block on a handle from ``estimate_batch_async`` and convert to
        Humans."""
        packed, b, h, w = handle
        packed = jax.device_get(packed)  # one fetch for the whole batch
        return [
            decode_device.packed_to_humans(packed[i], h, w, self.config)
            for i in range(b)
        ]

    def get_outputs(
        self, image: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, float]:
        """(pafs [h, w, 38], heatmaps [h, w, 19], im_scale) for one BGR
        image, reproducing reference estimator.py:71-88."""
        im_pad, im_scale, _ = padding(
            image, self.dest_size, self.config.MODEL.DOWNSAMPLE
        )
        self._maybe_calibrate(im_pad)
        fwd = self._forward_fn(*im_pad.shape[:2])
        paf, heatmap = fwd(self.variables, jnp.asarray(im_pad))
        return np.asarray(paf), np.asarray(heatmap), im_scale

    def estimate(
        self, image: np.ndarray
    ) -> Tuple[List[Human], float]:
        """Assembled people + im_scale for one BGR image."""
        if self.decode_backend == "jax":
            im_pad, im_scale, _ = padding(
                image, self.dest_size, self.config.MODEL.DOWNSAMPLE
            )
            self._maybe_calibrate(im_pad)
            if self.fuse_decode:
                fused = self._fused_fn(*im_pad.shape[:2])
                packed = fused(self.variables, jnp.asarray(im_pad))
            else:
                # two cached executables chained on device: the
                # paf/heatmap buffers never come back to the host
                fwd = self._forward_fn(*im_pad.shape[:2])
                paf, heatmap = fwd(self.variables, jnp.asarray(im_pad))
                if self._decoder is None:
                    raw = decode_device.build_packed_decoder(self.config)

                    def dec(hm, pf, _raw=raw, _p=self.precision):
                        with matmul_precision(_p):
                            return _raw(hm, pf)

                    self._decoder = dec
                packed = self._decoder(heatmap, paf)
            # pre-stage the fetch: copy_to_host_async rides the bulk
            # transfer path; a naive device_get on a packed result
            # measured ~2 orders of magnitude slower through a
            # high-latency device link (EVAL_BREAKDOWN.json)
            if hasattr(packed, "copy_to_host_async"):
                packed.copy_to_host_async()
            humans = decode_device.packed_to_humans(
                jax.device_get(packed), im_pad.shape[0], im_pad.shape[1],
                self.config,
            )
            return humans, im_scale
        pafs, heatmaps, im_scale = self.get_outputs(image)
        humans = decode_api.paf_to_pose(
            heatmaps, pafs, self.config, backend=self.decode_backend
        )
        return humans, im_scale
