"""Vector visualization.

Parity with reference wdbx/utils/visualization.py: dimensionality
reduction via PCA/t-SNE/UMAP (:35-100), 2D/3D scatter plots (:102-365),
cosine similarity-matrix heatmap (:367-451), and
``visualize_vectors_from_db`` pulling up to ``max_vectors`` through the
store (:453-523). Rendering uses matplotlib (plotly/dash are not in
this image; the reference's interactive Dash dashboard maps to the
static ``save_dashboard`` multi-panel figure). PCA runs ON DEVICE as a
jitted power-iteration eigensolve — reducing 100k×384 vectors is a
matmul workload, exactly what the MXU is for.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any

import numpy as np

logger = logging.getLogger("wdbx_tpu.utils.visualization")


@partial(__import__("jax").jit, static_argnames=("components", "iters"))
def _device_pca(x, components: int = 2, iters: int = 50):
    """PCA via subspace (block power) iteration on the covariance —
    two MXU matmuls per step, no host round trips."""
    import jax
    import jax.numpy as jnp

    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mean
    cov = (xc.T @ xc) / x.shape[0]  # (d, d)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (cov.shape[0], components), jnp.float32)

    def step(_, q):
        z = cov @ q
        q, _ = jnp.linalg.qr(z)
        return q

    q = jax.lax.fori_loop(0, iters, step, q)
    return xc @ q, q


class VectorVisualizer:
    def __init__(self, wdbx: Any | None = None):
        self.wdbx = wdbx

    # -- reduction ---------------------------------------------------------
    def reduce(
        self,
        vectors: np.ndarray,
        method: str = "pca",
        components: int = 2,
        **kwargs: Any,
    ) -> np.ndarray:
        vectors = np.asarray(vectors, np.float32)
        if method == "pca":
            import jax.numpy as jnp

            reduced, _ = _device_pca(jnp.asarray(vectors), components=components)
            return np.asarray(reduced)
        if method == "tsne":
            from sklearn.manifold import TSNE

            perplexity = min(
                kwargs.pop("perplexity", 30), max(2, len(vectors) - 1)
            )
            return TSNE(
                n_components=components, perplexity=perplexity, **kwargs
            ).fit_transform(vectors)
        if method == "umap":
            try:
                from umap import UMAP
            except ImportError as e:
                raise ValueError(
                    "umap-learn is not installed; use method='pca' or 'tsne'"
                ) from e
            return UMAP(n_components=components, **kwargs).fit_transform(vectors)
        raise ValueError(f"unknown reduction method: {method}")

    # -- plots -------------------------------------------------------------
    def scatter_plot(
        self,
        vectors: np.ndarray,
        labels: list[str] | None = None,
        method: str = "pca",
        components: int = 2,
        title: str = "Vector space",
        output_path: str | None = None,
    ):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        reduced = self.reduce(vectors, method=method, components=components)
        fig = plt.figure(figsize=(8, 6))
        if components == 3:
            ax = fig.add_subplot(111, projection="3d")
            ax.scatter(reduced[:, 0], reduced[:, 1], reduced[:, 2], s=12)
        else:
            ax = fig.add_subplot(111)
            ax.scatter(reduced[:, 0], reduced[:, 1], s=12)
            if labels is not None:
                for (x, y), lbl in zip(reduced[:, :2], labels):
                    ax.annotate(str(lbl), (x, y), fontsize=7, alpha=0.7)
        ax.set_title(f"{title} ({method.upper()})")
        if output_path:
            fig.savefig(output_path, dpi=120, bbox_inches="tight")
            plt.close(fig)
            return output_path
        return fig

    def similarity_matrix(
        self,
        vectors: np.ndarray,
        labels: list[str] | None = None,
        title: str = "Cosine similarity",
        output_path: str | None = None,
    ):
        """Heatmap of pairwise cosine similarities (computed on device)."""
        import jax.numpy as jnp
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from wdbx_tpu.ops.normalize import l2_normalize

        x = l2_normalize(jnp.asarray(vectors, jnp.float32))
        sims = np.asarray(x @ x.T)
        fig, ax = plt.subplots(figsize=(7, 6))
        im = ax.imshow(sims, cmap="viridis", vmin=-1, vmax=1)
        fig.colorbar(im, ax=ax)
        if labels is not None and len(labels) <= 40:
            ax.set_xticks(range(len(labels)))
            ax.set_yticks(range(len(labels)))
            ax.set_xticklabels(labels, rotation=90, fontsize=7)
            ax.set_yticklabels(labels, fontsize=7)
        ax.set_title(title)
        if output_path:
            fig.savefig(output_path, dpi=120, bbox_inches="tight")
            plt.close(fig)
            return output_path
        return fig

    # -- store integration -------------------------------------------------
    def _pull_vectors(
        self, max_vectors: int = 1000, filter_metadata: dict | None = None
    ) -> tuple[np.ndarray, list[str], list[dict]]:
        if self.wdbx is None:
            raise ValueError("no WDBX instance attached")
        store = self.wdbx.store
        ids, vecs, metas = [], [], []
        with store._lock:
            for registry in store.registries:
                for vid, _slot in registry.items():
                    if len(ids) >= max_vectors:
                        break
                    got = store.get(vid)
                    if got is None:
                        continue
                    vec, meta = got
                    if filter_metadata:
                        from wdbx_tpu.store.filters import matches_filter

                        if not matches_filter(meta, filter_metadata):
                            continue
                    ids.append(vid)
                    vecs.append(vec)
                    metas.append(meta)
        if not vecs:
            raise ValueError("no vectors to visualize")
        return np.asarray(vecs, np.float32), ids, metas

    def visualize_vectors_from_db(
        self,
        max_vectors: int = 1000,
        method: str = "pca",
        components: int = 2,
        filter_metadata: dict | None = None,
        output_path: str | None = None,
    ):
        vectors, ids, _ = self._pull_vectors(max_vectors, filter_metadata)
        return self.scatter_plot(
            vectors,
            labels=ids if len(ids) <= 50 else None,
            method=method,
            components=components,
            output_path=output_path,
        )

    def save_dashboard(
        self, output_path: str, max_vectors: int = 500
    ) -> str:
        """Static multi-panel dashboard: PCA scatter + similarity heatmap
        + norm histogram (the reference's Dash app, sans server)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        vectors, ids, _ = self._pull_vectors(max_vectors)
        fig, axes = plt.subplots(1, 3, figsize=(18, 5))
        reduced = self.reduce(vectors, method="pca", components=2)
        axes[0].scatter(reduced[:, 0], reduced[:, 1], s=10)
        axes[0].set_title("PCA projection")
        import jax.numpy as jnp

        from wdbx_tpu.ops.normalize import l2_normalize

        sample = vectors[: min(len(vectors), 64)]
        x = l2_normalize(jnp.asarray(sample))
        axes[1].imshow(np.asarray(x @ x.T), cmap="viridis", vmin=-1, vmax=1)
        axes[1].set_title(f"Similarity (first {len(sample)})")
        axes[2].hist(np.linalg.norm(vectors, axis=-1), bins=30)
        axes[2].set_title("Vector norms")
        fig.suptitle(f"WDBX dashboard — {len(vectors)} vectors")
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return output_path
