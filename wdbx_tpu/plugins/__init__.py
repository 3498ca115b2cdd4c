from wdbx_tpu.plugins.base import (
    PluginError,
    PluginManager,
    WDBXPlugin,
    load_plugins,
)

#: embedding-provider priority, same order as the reference's embedding
#: endpoints (reference wdbx/api/server.py:198-204), lmstudio appended
EMBEDDING_PLUGIN_PRIORITY = [
    "openai", "ollama", "huggingface", "sentencetransformers", "lmstudio",
]


def iter_embedding_plugins(manager):
    """Plugins in embedding-fallback order: the priority names first,
    then every remaining loaded plugin. Shared by the API embedding
    endpoints and the CLI's --from-text."""
    if manager is None:
        return
    for name in EMBEDDING_PLUGIN_PRIORITY:
        plugin = manager.get(name)
        if plugin is not None:
            yield plugin
    for name, plugin in manager.plugins.items():
        if name not in EMBEDDING_PLUGIN_PRIORITY:
            yield plugin


__all__ = [
    "WDBXPlugin", "PluginManager", "PluginError", "load_plugins",
    "EMBEDDING_PLUGIN_PRIORITY", "iter_embedding_plugins",
]
