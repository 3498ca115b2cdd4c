from wdbx_tpu.api.server import WDBXAPIServer

__all__ = ["WDBXAPIServer"]
