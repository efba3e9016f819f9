"""Video pose inference (reference run_video.py), pipelined.

    python -m torch_ekpose_tpu.cli.run_video -m vgg2016 -c ckpt.pth \
        -v in.mp4 -o out.mp4

Unlike the reference — which decodes the entire video into memory first
(reference run_video.py:42-52) and then runs one synchronous
frame->device->host->C++ round trip per frame — this pipeline streams:
a reader thread prefetches frames into a bounded queue, every frame is
padded to ONE static shape (a single XLA compilation), and with
``--decode-backend jax`` the forward pass and pose decode run as a single
device program per frame.
"""

from __future__ import annotations

import argparse
import queue
import threading
import time

from torch_ekpose_tpu.cli import common
from torch_ekpose_tpu.utils.human import draw_humans


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    parser.add_argument("-v", "--video", type=str, required=True)
    parser.add_argument("-o", "--output", type=str, default=None)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.set_defaults(decode_backend="jax")
    args = parser.parse_args(argv)

    import cv2

    estimator = common.build_estimator(args)

    capture = cv2.VideoCapture(args.video)
    if not capture.isOpened():
        raise SystemExit(f"ERROR: cannot open {args.video}")
    fps = capture.get(cv2.CAP_PROP_FPS) or 30.0
    output = args.output or args.video.rsplit(".", 1)[0] + "_out.mp4"

    frames: "queue.Queue" = queue.Queue(maxsize=64)

    def reader():
        n = 0
        while True:
            ok, frame = capture.read()
            if not ok or (args.max_frames and n >= args.max_frames):
                break
            frames.put(frame)
            n += 1
        frames.put(None)
        capture.release()

    threading.Thread(target=reader, daemon=True).start()

    writer = None
    n_frames = 0
    t0 = time.time()
    while True:
        frame = frames.get()
        if frame is None:
            break
        humans, _ = estimator.estimate(frame)
        out = draw_humans(frame, humans)
        if writer is None:
            writer = cv2.VideoWriter(
                output, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (out.shape[1], out.shape[0]),
            )
        writer.write(out)
        n_frames += 1
    if writer is not None:
        writer.release()
    dt = time.time() - t0
    print(
        f"INFO: {n_frames} frames in {dt:.1f}s "
        f"({n_frames / max(dt, 1e-9):.2f} FPS) -> {output}"
    )


if __name__ == "__main__":
    main()
