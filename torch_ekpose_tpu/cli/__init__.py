"""User-facing command-line entry points, mirroring the reference's seven
top-level scripts (train.py, eval.py, run_image.py, run_video.py,
run_webcam.py, test_loader.py, vis_output.py) as ``python -m
torch_ekpose_tpu.cli.<name>`` modules."""
