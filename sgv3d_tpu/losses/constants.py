"""Loss mode constants (API parity with the reference's losses/constants.py)."""
BINARY_MODE = "binary"
MULTICLASS_MODE = "multiclass"
MULTILABEL_MODE = "multilabel"
