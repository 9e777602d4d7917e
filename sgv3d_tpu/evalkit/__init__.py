from sgv3d_tpu.evalkit.eval_ap import kitti_eval
from sgv3d_tpu.evalkit.kitti_common import get_label_anno, get_label_annos
from sgv3d_tpu.evalkit.evaluator import RoadSideEvaluator, kitti_evaluation

__all__ = ["kitti_eval", "get_label_anno", "get_label_annos",
           "RoadSideEvaluator", "kitti_evaluation"]
