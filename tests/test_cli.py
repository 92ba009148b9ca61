"""CLI surface tests — the reference's converter CLIs, driven as a
user would (subprocess, real files)."""

from __future__ import annotations

import json
import subprocess
import sys


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "universal_data_to_orc_converter_spark", *args],
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_cli_csv_conversion(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "users.csv").write_text("id,name\n1,ann\n2,bo\n")
    out = tmp_path / "out"
    r = run_cli("csv", str(src), str(out))
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert "users" in payload["tables"]
    assert list(out.glob("users/*.orc"))


def test_cli_dump_conversion(tmp_path):
    dump = tmp_path / "d.sql"
    dump.write_text(
        "CREATE TABLE t (id INT, s VARCHAR(20));"
        "INSERT INTO t VALUES (1, 'a;b'), (2, NULL);"
    )
    out = tmp_path / "out"
    r = run_cli("dump", str(dump), str(out))
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(payload["tables"]) == {"t"}


def test_cli_mysql_requires_env_password(tmp_path):
    r = run_cli(
        "mysql", str(tmp_path / "o"),
        "--host", "h", "--database", "d", "--user", "u",
    )
    assert r.returncode == 2
    assert "MYSQL_PASSWORD" in r.stderr


def test_cli_rejects_unknown_command():
    r = run_cli("nope")
    assert r.returncode != 0
