"""Config system tests (parity spec: reference tests/test_core.py:57-88)."""

import json

import pytest

from wdbx_tpu.core.config import WDBXConfig


class TestConfig:
    def test_defaults(self):
        cfg = WDBXConfig()
        assert cfg.get("VECTOR_DIMENSION") == 384
        assert cfg.get("NUM_SHARDS") == 1
        assert cfg.get("INDEX_TYPE") == "flat"
        assert cfg.get_source("VECTOR_DIMENSION") == "default"

    def test_runtime_overrides(self):
        cfg = WDBXConfig({"vector_dimension": 128, "CUSTOM_KEY": "x"})
        assert cfg.get("VECTOR_DIMENSION") == 128
        assert cfg.get("CUSTOM_KEY") == "x"
        assert cfg.get_source("VECTOR_DIMENSION") == "runtime"

    def test_env_pickup_and_inference(self, monkeypatch):
        monkeypatch.setenv("WDBX_VECTOR_DIMENSION", "512")
        monkeypatch.setenv("WDBX_SOME_FLAG", "true")
        monkeypatch.setenv("WDBX_SOME_FLOAT", "0.5")
        monkeypatch.setenv("WDBX_SOME_LIST", "[1, 2, 3]")
        monkeypatch.setenv("WDBX_SOME_STR", "hello world")
        cfg = WDBXConfig()
        assert cfg.get("VECTOR_DIMENSION") == 512
        assert cfg.get("SOME_FLAG") is True
        assert cfg.get("SOME_FLOAT") == 0.5
        assert cfg.get("SOME_LIST") == [1, 2, 3]
        assert cfg.get("SOME_STR") == "hello world"
        assert cfg.get_source("VECTOR_DIMENSION") == "env"

    def test_precedence_runtime_beats_env_beats_file(self, monkeypatch, tmp_path):
        path = tmp_path / "cfg.json"
        path.write_text(json.dumps({"A": "file", "B": "file", "C": "file"}))
        monkeypatch.setenv("WDBX_A", "env")
        monkeypatch.setenv("WDBX_B", "env")
        cfg = WDBXConfig({"A": "runtime"}, config_file=str(path))
        assert cfg.get("A") == "runtime"
        assert cfg.get("B") == "env"
        assert cfg.get("C") == "file"

    def test_get_typed_coercion(self):
        cfg = WDBXConfig(
            {"N": "42", "F": "2.5", "FLAG": "yes", "L": "a, b,c", "D": '{"x": 1}'}
        )
        assert cfg.get_typed("N", int) == 42
        assert cfg.get_typed("F", float) == 2.5
        assert cfg.get_typed("FLAG", bool) is True
        assert cfg.get_typed("L", list) == ["a", "b", "c"]
        assert cfg.get_typed("D", dict) == {"x": 1}
        assert cfg.get_typed("N", dict, default={"d": 1}) == {"d": 1}
        assert cfg.get_typed("MISSING", int, default=7) == 7

    def test_dict_dunders(self):
        cfg = WDBXConfig()
        cfg["MY_KEY"] = 5
        assert cfg["MY_KEY"] == 5
        assert "MY_KEY" in cfg
        assert "my_key" in cfg  # case-insensitive
        with pytest.raises(KeyError):
            cfg["NOPE"]

    def test_json_file_load(self, tmp_path):
        path = tmp_path / "cfg.json"
        path.write_text(json.dumps({"VECTOR_DIMENSION": 777}))
        cfg = WDBXConfig(config_file=str(path))
        assert cfg.get("VECTOR_DIMENSION") == 777
        assert cfg.get_source("VECTOR_DIMENSION") == "file"


class TestFromFile:
    def test_yaml_sections_map_to_flat_keys(self, tmp_path):
        path = tmp_path / "cfg.yaml"
        path.write_text(
            "core:\n"
            "  vector_dimension: 128\n"
            "  num_shards: 4\n"
            "indexing:\n"
            "  type: ivf\n"
            "  dtype: bfloat16\n"
            "  ivf:\n"
            "    nlist: 64\n"
            "    nprobe: 4\n"
            "api:\n"
            "  port: 9001\n"
            "parallel:\n"
            "  mesh_axis: shard\n"
            "  replicas: 2\n"
            "  auto_remesh: true\n"
            "  replication_factor: 2\n"
            "plugins:\n"
            "  enabled: false\n"
            "  ollama:\n"
            "    model: mistral\n"
        )
        cfg = WDBXConfig.from_file(str(path))
        assert cfg.get("VECTOR_DIMENSION") == 128
        assert cfg.get("NUM_SHARDS") == 4
        assert cfg.get("INDEX_TYPE") == "ivf"
        assert cfg.get("INDEX_DTYPE") == "bfloat16"
        assert cfg.get("IVF_NLIST") == 64
        assert cfg.get("IVF_NPROBE") == 4
        assert cfg.get("API_PORT") == 9001
        assert cfg.get("MESH_AXIS") == "shard"
        assert cfg.get("MESH_REPLICAS") == 2
        assert cfg.get("MESH_AUTO_REMESH") is True
        assert cfg.get("DISTRIBUTED_REPLICATION_FACTOR") == 2
        assert cfg.get("PLUGINS_ENABLED") is False
        assert cfg.get("OLLAMA_MODEL") == "mistral"

    def test_overrides_win(self, tmp_path):
        path = tmp_path / "cfg.yaml"
        path.write_text("core:\n  vector_dimension: 128\n")
        cfg = WDBXConfig.from_file(str(path), vector_dimension=64)
        assert cfg.get("VECTOR_DIMENSION") == 64

    def test_canonical_repo_config_loads(self):
        cfg = WDBXConfig.from_file("config/wdbx_config.yaml")
        assert cfg.get("VECTOR_DIMENSION") == 384
        assert cfg.get("IVF_NLIST") == 100
        assert cfg.get("INDEX_TYPE") == "flat"
