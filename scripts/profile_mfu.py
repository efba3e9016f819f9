"""Per-segment MFU profile of the vgg2016 forward, plus candidate
implementations of the dominant 7x7 CPM stack measured side by side.

VERDICT round-1 #4: forward sits at ~57-68% of v5e bf16 peak and the five
7x7x128 convs per branch per stage (reference lib/network/vgg2016.py:54-76)
dominate; this script localizes where the cycles go (backbone vs stage-1 vs
refinement stages) using XLA's own cost analysis for the FLOP numerator,
then times numerically-exact variants of the 7x7 stack:

  v0 conv-nhwc   the production path (lax conv via flax ConvBlock layout)
  v1 pad192      stage input concat is 185ch (38+19+128); pad activations
                 AND kernel input rows with zeros to 192 (1.5 MXU tiles) —
                 exact, changes only XLA's tiling
  v2 im2col      explicit patch-extraction matmul: [B*H*W, 49*128] x
                 [49*128, 128] so the MXU sees one big GEMM per conv
  v3 shifts      7x7 conv as a sum of 49 shifted 1x1 contractions (the
                 trick that won 6.7x on the PAF line integral)
  v4 nchw        feature-dim-last -> feature-dim-second layout

Run on the real chip: python scripts/profile_mfu.py [--trace /tmp/trace]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(fn, *args, n=30, chain=0):
    """Best (min over 3 timed groups) seconds per call, compile excluded.

    Honest timing through the device tunnel: each call's input
    ``args[chain]`` is perturbed by a zero scalar computed FROM the
    previous call's output, so call k+1 cannot execute before call k
    finishes, and the clock stops on a real value fetch —
    ``block_until_ready`` has returned before queued work executed
    under tunnel congestion (see bench.py), yielding impossible
    speeds."""

    def wrapped(tweak, *a):
        a = list(a)
        a[chain] = a[chain] + tweak.astype(a[chain].dtype)
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        # Return the FULL output alongside the chain scalar: returning
        # only the derived scalar lets XLA dead-code-eliminate any work
        # that doesn't feed output element [0] (measured: the decode
        # stage vanished from a scalar-only pipeline program — 2262 vs
        # 2441 GFLOP in cost_analysis — inflating fps by ~20%).
        return out, (leaf.ravel()[0] * 0).astype(jnp.float32)

    jfn = jax.jit(wrapped)
    _, tweak = jfn(jnp.asarray(0.0, jnp.float32), *args)
    jax.block_until_ready(tweak)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            _, tweak = jfn(tweak, *args)
        final = float(jax.device_get(tweak))  # real fetch ends the clock
        times.append((time.perf_counter() - t0) / n)
        if final != 0.0:
            raise RuntimeError(f"chain scalar should be 0, got {final}")
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    flops = float((cost or {}).get("flops", 0.0))
    return min(times), flops


def report(name, secs, flops, peak):
    mfu = round(flops / secs / peak, 3) if peak else None
    print(json.dumps({
        "segment": name, "ms": round(secs * 1e3, 3),
        "gflop": round(flops / 1e9, 2), "mfu": mfu,
    }), flush=True)
    return mfu


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=368)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--cpu", action="store_true",
                   help="smoke-test the script on the CPU backend")
    p.add_argument("--trace", default=None,
                   help="also write a jax.profiler trace of the full fwd")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from torch_ekpose_tpu.models import cast_params, init_model

    h, w = args.height, args.width
    b = args.batch
    from torch_ekpose_tpu.utils.hardware import bf16_peak_flops

    peak = bf16_peak_flops(jax.devices()[0].device_kind)
    print(f"# device={jax.devices()[0].device_kind} peak={peak}", flush=True)

    model, variables = init_model(
        "vgg2016", input_shape=(1, h, w, 3), dtype=jnp.bfloat16
    )
    variables = cast_params(variables, jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.bfloat16)

    # ---- whole forward + per-segment split ----------------------------
    def full(v, x):
        (paf, ht), _ = model.apply(v, x, train=False)
        return paf, ht

    secs, flops = bench(full, variables, x, chain=1)
    report("full-forward", secs, flops, peak)
    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(jax.jit(full)(variables, x))
        print(f"# trace written to {args.trace}", flush=True)

    # backbone alone
    bb = model.backbone(name="model0")
    bb_vars = {"params": variables["params"]["model0"]}
    secs, flops = bench(lambda v, x: bb.apply(v, x), bb_vars, x, chain=1)
    report("backbone", secs, flops, peak)

    # one refinement stage (both branches) on the real concat shape
    feats = jax.jit(lambda v, x: bb.apply(v, x))(bb_vars, x)
    fh, fw = feats.shape[1:3]
    cat = jnp.concatenate(
        [jnp.zeros((b, fh, fw, 57), jnp.bfloat16), feats], axis=-1
    )
    s2 = {"params": {
        "model2_1": variables["params"]["head"]["model2_1"],
        "model2_2": variables["params"]["head"]["model2_2"],
    }}

    from torch_ekpose_tpu.models.heads import VggBranch

    def one_stage(v, cat):
        paf = VggBranch(38, first_stage=False, dtype=jnp.bfloat16,
                        name="model2_1").apply(
            {"params": v["params"]["model2_1"]}, cat)
        ht = VggBranch(19, first_stage=False, dtype=jnp.bfloat16,
                       name="model2_2").apply(
            {"params": v["params"]["model2_2"]}, cat)
        return paf, ht

    secs, flops = bench(one_stage, s2, cat, chain=1)
    report("one-7x7-stage(2br)", secs, flops, peak)

    # ---- variants of the 5x(7x7,128) stack ----------------------------
    kr = jax.random.PRNGKey(0)
    ks = [jax.random.normal(jax.random.fold_in(kr, i),
                            (7, 7, 128, 128), jnp.bfloat16) * 0.05
          for i in range(5)]
    k0 = jax.random.normal(jax.random.fold_in(kr, 99),
                           (7, 7, 185, 128), jnp.bfloat16) * 0.05
    xin = jnp.asarray(
        rng.standard_normal((b, fh, fw, 185)), jnp.bfloat16
    )
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, k, dims=dn):
        return jax.nn.relu(jax.lax.conv_general_dilated(
            x, k, (1, 1), [(3, 3)] * 2, dimension_numbers=dims))

    def v0(x):
        x = conv(x, k0)
        for k in ks:
            x = conv(x, k)
        return x

    secs, flops = bench(v0, xin)
    base = secs
    report("stack-v0-conv", secs, flops, peak)

    # v1: zero-pad the 185-channel entry conv to 192 in both operands
    xpad = jnp.pad(xin, ((0, 0), (0, 0), (0, 0), (0, 7)))
    k0pad = jnp.pad(k0, ((0, 0), (0, 0), (0, 7), (0, 0)))

    def v1(x):
        x = conv(x, k0pad)
        for k in ks:
            x = conv(x, k)
        return x

    def rel_close(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        scale = float(jnp.abs(a).max()) or 1.0
        return bool(jnp.abs(a - b).max() / scale < 2e-2)

    secs, flops = bench(v1, xpad)
    report("stack-v1-pad192", secs, flops, peak)
    print(f"# v1 close: {rel_close(v0(xin), v1(xpad))}", flush=True)

    # v2: im2col GEMM for the 128->128 convs
    def im2col_conv(x, k):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        patches = jnp.stack([
            jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(xp, dy, fh, 1), dx, fw, 2)
            for dy in range(7) for dx in range(7)
        ], axis=-2)                       # [B, H, W, 49, C]
        flat = patches.reshape(x.shape[0], fh, fw, 49 * k.shape[2])
        kf = k.reshape(49 * k.shape[2], k.shape[3])
        return jax.nn.relu(flat @ kf)

    def v2(x):
        x = conv(x, k0)
        for k in ks:
            x = im2col_conv(x, k)
        return x

    secs, flops = bench(v2, xin)
    report("stack-v2-im2col", secs, flops, peak)
    print(f"# v2 close: {rel_close(v0(xin), v2(xin))}", flush=True)

    # v3: 49 shifted pointwise contractions
    def shift_conv(x, k):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        acc = None
        for dy in range(7):
            for dx in range(7):
                sl = jax.lax.dynamic_slice(
                    xp, (0, dy, dx, 0), (x.shape[0], fh, fw, k.shape[2]))
                t = sl @ k[dy, dx]
                acc = t if acc is None else acc + t
        return jax.nn.relu(acc)

    def v3(x):
        x = conv(x, k0)
        for k in ks:
            x = shift_conv(x, k)
        return x

    secs, flops = bench(v3, xin)
    report("stack-v3-shifts", secs, flops, peak)

    # v4: NCHW activations
    dims_nchw = ("NCHW", "OIHW", "NCHW")
    xin_c = jnp.transpose(xin, (0, 3, 1, 2))
    k0_c = jnp.transpose(k0, (3, 2, 0, 1))
    ks_c = [jnp.transpose(k, (3, 2, 0, 1)) for k in ks]

    def v4(x):
        x = conv(x, k0_c, dims_nchw)
        for k in ks_c:
            x = conv(x, k, dims_nchw)
        return x

    secs, flops = bench(v4, xin_c)
    report("stack-v4-nchw", secs, flops, peak)

    # ---- two-branch stage fusion variants -----------------------------
    # Both branches of a stage consume the SAME input, so their entry
    # convs can run as ONE conv with concatenated output channels
    # (exact); later layers have disjoint inputs and would need
    # block-diagonal kernels (2x FLOPs). v5 measures entry-only fusion;
    # v6 measures the full block-diagonal stage — if v6's wall-clock is
    # close to v0's two-branch cost, the MXU is idle half the time on
    # 128-channel convs and the whole head should run at 256 channels.
    kb = [jax.random.normal(jax.random.fold_in(kr, 50 + i),
                            (7, 7, 128, 128), jnp.bfloat16) * 0.05
          for i in range(5)]
    k0b = jax.random.normal(jax.random.fold_in(kr, 98),
                            (7, 7, 185, 128), jnp.bfloat16) * 0.05

    def two_branch(x):
        a, bb_ = v0(x), None
        y = conv(x, k0b)
        for k in kb:
            y = conv(y, k)
        return a, y

    secs, flops = bench(two_branch, xin)
    report("stage-2br-separate", secs, flops, peak)

    k0f = jnp.concatenate([k0, k0b], axis=-1)         # 185 -> 256

    def v5(x):
        y = conv(x, k0f)
        a, bb_ = y[..., :128], y[..., 128:]
        for k in ks:
            a = conv(a, k)
        for k in kb:
            bb_ = conv(bb_, k)
        return a, bb_

    secs, flops = bench(v5, xin)
    report("stage-v5-fused-entry", secs, flops, peak)

    zeros = jnp.zeros_like(ks[0])
    kf = [jnp.concatenate([
        jnp.concatenate([ka, zeros], axis=-1),
        jnp.concatenate([zeros, kc], axis=-1),
    ], axis=-2) for ka, kc in zip(ks, kb)]            # block-diag 256->256

    def v6(x):
        y = conv(x, k0f)
        for k in kf:
            y = conv(y, k)
        return y[..., :128], y[..., 128:]

    secs, flops = bench(v6, xin)
    report("stage-v6-blockdiag256", secs, flops, peak)
    ra, rb = two_branch(xin)
    fa, fb = v6(xin)
    print(f"# v6 close: {rel_close(ra, fa) and rel_close(rb, fb)}",
          flush=True)

    # ---- v7: int8 MXU probe -------------------------------------------
    # v5e's int8 peak (394 TOPS) is 2x bf16; if XLA lowers an
    # int8xint8->int32 conv onto that path, a quantized serving mode
    # roughly doubles the compute-bound headline. Per-output-channel
    # weight scales, dynamic per-tensor activation scale — the standard
    # post-training scheme a real int8 mode would use.
    def quant_w(k):
        s = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
        q = jnp.clip(jnp.round(k.astype(jnp.float32) / s), -127, 127)
        return q.astype(jnp.int8), s

    qs = [quant_w(k) for k in ks]
    q0, s0 = quant_w(k0)

    def int8_conv(x, qk, sw):
        sx = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, qk, (1, 1), [(3, 3)] * 2, dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return jax.nn.relu(
            (y.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)
        )

    def v7(x):
        x = int8_conv(x, q0, s0)
        for qk, sw in qs:
            x = int8_conv(x, qk, sw)
        return x

    secs, flops = bench(v7, xin)
    report("stack-v7-int8", secs, flops, peak)
    a, bq = v0(xin).astype(jnp.float32), v7(xin).astype(jnp.float32)
    rel = float(jnp.abs(a - bq).max() / jnp.abs(a).max())
    # ~1.3% per layer is inherent int8 quantization error; report the
    # stack total rather than a pass/fail bar
    print(f"# v7 rel err vs bf16: {rel:.4f}", flush=True)

    print(f"# baseline stack ms: {base * 1e3:.3f}", flush=True)


if __name__ == "__main__":
    main()
