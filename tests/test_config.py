"""Externalized pipeline config (configs/pipeline_config.yml).

Pure-Python (no Spark): loadable in the reference-style Spark-free CI
job. The YAML file is the ops source of truth; the dataclass defaults
must mirror it so config-less library use behaves identically.
"""

from __future__ import annotations

import os

import pytest

from instacart_medallion_lakehouse_spark import quality

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO_ROOT, "configs", "pipeline_config.yml")


class TestGateThresholdsFromYaml:
    def test_repo_config_matches_defaults(self):
        assert quality.GateThresholds.from_yaml(CONFIG) == quality.DEFAULT_THRESHOLDS

    def test_override(self, tmp_path):
        p = tmp_path / "cfg.yml"
        p.write_text("quality_thresholds:\n  duplicate_rate: 0.5\n")
        t = quality.GateThresholds.from_yaml(str(p))
        assert t.duplicate_rate == 0.5
        assert t.null_rate_default == quality.DEFAULT_THRESHOLDS.null_rate_default

    def test_unknown_key_fails_fast(self, tmp_path):
        p = tmp_path / "cfg.yml"
        p.write_text("quality_thresholds:\n  nul_rate_default: 0.5\n")
        with pytest.raises(ValueError, match="nul_rate_default"):
            quality.GateThresholds.from_yaml(str(p))

    def test_empty_file_gives_defaults(self, tmp_path):
        p = tmp_path / "cfg.yml"
        p.write_text("")
        assert quality.GateThresholds.from_yaml(str(p)) == quality.DEFAULT_THRESHOLDS


class TestFullConfig:
    def test_sections_present(self):
        cfg = quality.load_pipeline_config(CONFIG)
        assert set(cfg) >= {"quality_thresholds", "spark", "tables"}
        assert cfg["tables"]["bronze"] == [
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
        ]


class TestEmptySection:
    def test_present_but_null_section_means_defaults(self, tmp_path):
        from instacart_medallion_lakehouse_spark.quality import (
            DEFAULT_THRESHOLDS,
            GateThresholds,
        )

        p = tmp_path / "cfg.yml"
        p.write_text("quality_thresholds:\n# all thresholds commented out\n")
        assert GateThresholds.from_yaml(str(p)) == DEFAULT_THRESHOLDS
