from wdbx_tpu.core.config import WDBXConfig
from wdbx_tpu.core.wdbx import WDBX

__all__ = ["WDBX", "WDBXConfig"]
