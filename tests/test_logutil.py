"""Logging setup + stats table (reference logging.py:60-170 parity)."""

from __future__ import annotations

import logging

import pytest

from parquet_converter_spark.logutil import format_stats_table, get_logger, setup_logging


def test_setup_logging_levels_and_file(tmp_path, capsys):
    log_file = tmp_path / "run.log"
    logger = setup_logging("INFO", str(log_file))
    logger.info("hello-info")
    logger.debug("hidden-debug")
    err = capsys.readouterr().err
    assert "hello-info" in err and "hidden-debug" not in err
    for h in logger.handlers:
        h.flush()
    text = log_file.read_text()
    assert "hello-info" in text


def test_setup_logging_verbose_and_idempotent(capsys):
    setup_logging("INFO", verbose=True)
    logger = setup_logging("INFO", verbose=True)  # second call must not stack handlers
    assert len(logger.handlers) == 1
    logger.debug("now-visible")
    assert capsys.readouterr().err.count("now-visible") == 1


def test_setup_logging_rejects_bad_level():
    with pytest.raises(ValueError):
        setup_logging("NOPE")


def test_get_logger_namespacing():
    assert get_logger("encode").name == "parquet_converter_spark.encode"


def test_format_stats_table_grid():
    rows = [
        {"run_id": "r1", "rows": 100, "status": "Success"},
        {"run_id": "r2", "rows": 5, "status": "Failed"},
    ]
    t = format_stats_table(rows)
    assert "run_id" in t and "r1" in t and "Failed" in t
    assert t.count("|") >= 12  # grid borders
    assert format_stats_table([]) == "No runs."
