"""HTTP pose-estimation server (a serving surface the reference lacks).

    python -m torch_ekpose_tpu.cli.serve -m vgg2016 -c ckpt.pth \
        --host 0.0.0.0 --port 8000 --max-batch 8

    # or serve an AOT deployment artifact (cli.export --aot): no model
    # build, no checkpoint conversion — the artifact IS the model
    python -m torch_ekpose_tpu.cli.serve --aot pose.ekx --port 8000

    curl -X POST --data-binary @image.jpg http://localhost:8000/pose
    curl http://localhost:8000/healthz
"""

from __future__ import annotations

import argparse

from torch_ekpose_tpu.cli import common
from torch_ekpose_tpu.runtime.server import PoseServer


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=8,
                        help="max frames sharing one device launch")
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="micro-batching window")
    parser.add_argument("--aot", type=str, default=None, metavar="ARTIFACT",
                        help="serve an AOT deployment artifact "
                        "(cli.export --aot) instead of building the "
                        "model; -m/-c/--dtype are ignored and "
                        "--max-batch is the artifact's baked batch")
    parser.set_defaults(decode_backend="jax")
    args = parser.parse_args(argv)

    if args.aot:
        from torch_ekpose_tpu.runtime.aot import (
            AotServingAdapter,
            load_pipeline,
        )

        common.enable_compilation_cache(
            getattr(args, "compilation_cache", None)
        )
        estimator = AotServingAdapter(load_pipeline(args.aot))
        args.max_batch = estimator.pipeline.batch
        print(f"INFO: serving AOT artifact {args.aot} "
              f"(batch {args.max_batch}, "
              f"{estimator.pipeline.meta['height']}x"
              f"{estimator.pipeline.meta['width']})")
    else:
        estimator = common.build_estimator(args)
    server = PoseServer(
        estimator, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
    )
    print(f"INFO: serving pose estimation on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
