from sgv3d_tpu.configs.exps import EXPS, get_exp

__all__ = ["EXPS", "get_exp"]
