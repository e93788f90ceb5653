"""Config load/overlay/save (reference tests/test_config.py:38-172)."""

from __future__ import annotations

import pytest

from parquet_converter_spark.config import EngineConfig


def test_defaults():
    c = EngineConfig().validate()
    assert c.codec == "auto" and c.salt_rows == 65_536 and c.resume


def test_json_load_and_save_roundtrip(tmp_path):
    p = tmp_path / "c.json"
    EngineConfig(codec="fsst", salt_rows=1024).save(str(p))
    c = EngineConfig.load(str(p), env={})
    assert c.codec == "fsst" and c.salt_rows == 1024


def test_env_overrides_file(tmp_path):
    p = tmp_path / "c.json"
    EngineConfig(codec="plain").save(str(p))
    c = EngineConfig.load(str(p), env={"PCS_CODEC": "rle", "PCS_SALT_ROWS": "2048", "PCS_RESUME": "false"})
    assert c.codec == "rle" and c.salt_rows == 2048 and c.resume is False


def test_validation_errors():
    with pytest.raises(ValueError):
        EngineConfig(codec="nope").validate()
    with pytest.raises(ValueError):
        EngineConfig(salt_rows=0).validate()
    with pytest.raises(ValueError):
        EngineConfig.load(None, env={"PCS_SALT_ROWS": "-1"})


def test_unknown_keys_rejected(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{"codec": "auto", "bogus": 1}')
    with pytest.raises(ValueError, match="bogus"):
        EngineConfig.load(str(p), env={})
