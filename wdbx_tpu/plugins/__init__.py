from wdbx_tpu.plugins.base import (
    PluginError,
    PluginManager,
    WDBXPlugin,
    load_plugins,
)

__all__ = ["WDBXPlugin", "PluginManager", "PluginError", "load_plugins"]
