"""Every example runs end-to-end in one shared session (the reference's
examples are not CI-gated -- SURVEY §5 -- ours are)."""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

import pytest

EXAMPLES = [
    "e01_past_greeter",
    "e02_ticking",
    "e03_spread",
    "e04_trade_pnl",
    "e05_retail_cart",
    "e06_feedback",
    "e07_stats_vwap",
    "e08_dynamic_demux",
    "e09_past_to_live",
    "e10_live_socket",
    "e11_llm_curation",
    "e12_multimodal_lake",
    "e13_analytics_suite",
    "e14_embedding_graph",
    "e15_corpus_curation",
    "e16_ops_observability",
    "e17_data_selection",
    "e18_vector_index",
    "e19_curation_round6",
    "e20_streaming_intake",
    "e21_eval_sweep",
    "e22_versioned_corpus",
    "e23_lakehouse_cdc",
    "e24_lakehouse_hardening",
    "e25_operational_recovery",
    "e26_dml_suite",
    "e27_live_feedback",
    "e28_out_of_order_ops",
    "e29_entity_resolution",
]

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(spark, name):
    mod = importlib.import_module(name)
    result = mod.main(spark)
    assert result is not None
