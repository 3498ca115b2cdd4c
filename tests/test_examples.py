"""End-to-end example smoke tests — the reference examples' flows
(examples/basic_usage.py, examples/rag_implementation.py) must run
against this framework (BASELINE configs 1 and 5's RAG leg)."""

import os
import subprocess
import sys


_FORCE_CPU = (
    'import jax; jax.config.update("jax_platforms", "cpu")\n'
)  # the sandbox sitecustomize force-registers a TPU; env vars don't win


def _run(path, cwd):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        WDBX_OLLAMA_DEMO="true",
        PYTHONPATH=os.getcwd()
        + os.pathsep
        + os.environ.get("PYTHONPATH", ""),
    )
    return subprocess.run(
        [sys.executable, path], capture_output=True, text=True, timeout=300,
        cwd=cwd, env=env,
    )


class TestExamples:
    def test_rag_example(self, tmp_path):
        src = _FORCE_CPU + open("examples/rag_implementation.py").read()
        src = src.replace("./wdbx_data_rag", str(tmp_path / "rag"))
        script = tmp_path / "rag.py"
        script.write_text(src)
        result = _run(str(script), cwd=os.getcwd())
        assert result.returncode == 0, result.stderr[-2000:]
        assert "ingested" in result.stdout
        assert "answer:" in result.stdout

    def test_basic_usage_small(self, tmp_path):
        # Shrink the 10k batch to keep CI fast; the flow is identical.
        src = _FORCE_CPU + open("examples/basic_usage.py").read()
        src = src.replace("./wdbx_data_example", str(tmp_path / "basic"))
        src = src.replace("range(10_000)", "range(500)")
        script = tmp_path / "basic.py"
        script.write_text(src)
        result = _run(str(script), cwd=os.getcwd())
        assert result.returncode == 0, result.stderr[-2000:]
        assert "batch stored 500" in result.stdout
        assert "self-hit rate 1.00" in result.stdout


def test_production_serving_runs(tmp_path, monkeypatch):
    src = _FORCE_CPU + open("examples/production_serving.py").read()
    path = tmp_path / "prod.py"
    path.write_text(src)
    import runpy
    import sys

    monkeypatch.setattr(sys, "argv", ["prod.py"])
    runpy.run_path(str(path), run_name="__main__")


def test_clustered_at_scale_runs(tmp_path):
    src = _FORCE_CPU + open("examples/clustered_at_scale.py").read()
    # shrink for CI speed; the flow is identical
    src = src.replace("CHUNK = 4_096", "CHUNK = 1_024")
    script = tmp_path / "clustered.py"
    script.write_text(src)
    result = _run(str(script), cwd=os.getcwd())
    assert result.returncode == 0, result.stderr[-2000:]
    assert "bulk-loaded" in result.stdout
    assert "ids stable" in result.stdout
    assert "save/load round trip OK" in result.stdout
