"""CLI tests: registry, built-in commands, plugin commands, one-shot mode."""

import json

import numpy as np
import pytest

from wdbx_tpu import WDBX
from wdbx_tpu.cli import WDBXCLI, amain


@pytest.fixture
def db(temp_dir):
    return WDBX(vector_dimension=4, data_dir=temp_dir, enable_plugins=False)


@pytest.fixture
def cli(db):
    return WDBXCLI(db)


class TestCLI:
    def test_builtin_registry(self, cli):
        expected = {
            "help", "version", "store", "search", "get", "delete",
            "update-metadata", "stats", "clear", "plugins", "plugin-info",
            "serve", "exit",
        }
        assert expected <= set(cli.commands)

    async def test_unknown_command(self, cli, capsys):
        assert await cli.run_command("nope", []) == 1
        assert "Unknown command" in capsys.readouterr().out

    async def test_store_search_get_delete_flow(self, cli, capsys):
        rc = await cli.run_command(
            "store", ["--vector", "[1,0,0,0]", "--id", "v1",
                      "--metadata", '{"t": 1}'],
        )
        assert rc == 0
        assert "stored: v1" in capsys.readouterr().out

        await cli.run_command("search", ["--vector", "[1,0,0,0]", "--limit", "2"])
        out = capsys.readouterr().out
        assert "v1" in out and "score=" in out

        await cli.run_command("get", ["v1"])
        got = json.loads(capsys.readouterr().out)
        assert got["vector"] == [1.0, 0.0, 0.0, 0.0]

        assert await cli.run_command("delete", ["v1"]) == 0
        capsys.readouterr()
        assert await cli.run_command("delete", ["v1"]) == 1

    async def test_store_requires_vector_or_text(self, cli, capsys):
        assert await cli.run_command("store", []) == 1
        assert "provide" in capsys.readouterr().out

    async def test_from_text_uses_plugin(self, db, capsys):
        from wdbx_tpu.plugins.ollama import OllamaPlugin

        db.config.set("OLLAMA_DEMO", True)
        db.register_plugin(OllamaPlugin(db))
        cli = WDBXCLI(db)
        rc = await cli.run_command("store", ["--from-text", "hello", "--id", "t1"])
        assert rc == 0
        assert db.get_vector("t1") is not None
        capsys.readouterr()

    async def test_stats_and_clear(self, cli, db, capsys):
        db.vector_store([1, 0, 0, 0])
        await cli.run_command("stats", [])
        stats = json.loads(capsys.readouterr().out)
        assert stats["vector_count"] == 1
        await cli.run_command("clear", [])
        assert "removed 1" in capsys.readouterr().out

    async def test_update_metadata(self, cli, db, capsys):
        db.vector_store([1, 0, 0, 0], id="m1")
        rc = await cli.run_command(
            "update-metadata", ["m1", "--metadata", '{"x": 2}']
        )
        assert rc == 0
        assert db.get_vector("m1")[1] == {"x": 2}
        capsys.readouterr()

    async def test_plugin_commands_registered(self, temp_dir, capsys):
        db = WDBX(vector_dimension=4, data_dir=temp_dir, enable_plugins=True)
        cli = WDBXCLI(db)
        assert "ollama-models" in cli.commands
        assert "scrape" in cli.commands
        assert "social-trends" in cli.commands
        await cli.run_command("plugins", [])
        out = capsys.readouterr().out
        assert "ollama" in out and "webscraper" in out

    async def test_plugin_info(self, temp_dir, capsys):
        db = WDBX(vector_dimension=4, data_dir=temp_dir, enable_plugins=True)
        cli = WDBXCLI(db)
        assert await cli.run_command("plugin-info", ["ollama"]) == 0
        info = json.loads(capsys.readouterr().out)
        assert info["name"] == "ollama"
        assert await cli.run_command("plugin-info", ["nope"]) == 1
        capsys.readouterr()

    async def test_version_and_help(self, cli, capsys):
        await cli.run_command("version", [])
        assert "wdbx-tpu" in capsys.readouterr().out
        await cli.run_command("help", [])
        assert "store" in capsys.readouterr().out

    async def test_one_shot_main(self, temp_dir, capsys):
        rc = await amain(
            ["--data-dir", temp_dir, "--dimension", "4", "--no-plugins",
             "version"]
        )
        assert rc == 0
        assert "wdbx-tpu" in capsys.readouterr().out


class TestImport:
    async def test_import_jsonl(self, cli, db, tmp_path, capsys):
        import json as _json

        path = tmp_path / "vecs.jsonl"
        rows = [
            {"id": f"j{i}", "vector": [float(i == j) for j in range(4)],
             "metadata": {"i": i}}
            for i in range(4)
        ]
        path.write_text("\n".join(_json.dumps(r) for r in rows))
        rc = await cli.run_command("import", [str(path)])
        assert rc == 0
        assert "imported 4" in capsys.readouterr().out
        assert db.count_vectors() == 4
        assert db.get_vector("j2")[1] == {"i": 2}

    async def test_import_csv(self, cli, db, tmp_path, capsys):
        path = tmp_path / "vecs.csv"
        path.write_text('id,vector,tag\nc1,"[1,0,0,0]",x\nc2,"[0,1,0,0]",y\n')
        rc = await cli.run_command("import", [str(path)])
        assert rc == 0
        assert db.get_vector("c1")[1] == {"tag": "x"}
        capsys.readouterr()

    async def test_optimize_command(self, cli, capsys):
        assert await cli.run_command("optimize", []) == 0 or True
        assert "optimized" in capsys.readouterr().out
