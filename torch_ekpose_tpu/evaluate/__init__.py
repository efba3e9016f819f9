from torch_ekpose_tpu.evaluate.cocoeval import COCOKeypointEval
from torch_ekpose_tpu.evaluate.evaluator import (
    append_result,
    eval_coco,
    run_eval,
)

__all__ = ["COCOKeypointEval", "append_result", "eval_coco", "run_eval"]
