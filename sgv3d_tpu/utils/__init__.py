from sgv3d_tpu.utils.backup_files import backup_codebase

__all__ = ["backup_codebase"]
