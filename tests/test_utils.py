import dataclasses
import json
import os

import numpy as np
import pytest

from g4splat_tpu.utils.config import (
    apply_overrides,
    load_config,
    load_run_config,
    save_run_config,
)
from g4splat_tpu.utils.profiling import MetricsLogger, StageTimer


class TestConfig:
    def test_load_reference_configs(self):
        for group, names in {
            "mast3r": ["posed", "unposed"],
            "charts_alignment": ["default", "strong"],
            "free_gaussians_refinement": ["default", "long"],
            "adaptive_tetrahedralization": ["default"],
            "multiresolution_tsdf": ["default"],
        }.items():
            for n in names:
                cfg = load_config(group, n)
                assert isinstance(cfg, dict) and cfg

    def test_reference_schedule_values(self):
        fg = load_config("free_gaussians_refinement", "default")
        assert fg["iterations"] == 7000
        assert fg["densify_until_iter"] == 3500
        assert fg["opacity_reset_interval"] == 1000
        assert fg["depth_ratio"] == 0.5
        long = load_config("free_gaussians_refinement", "long")
        assert long["iterations"] == 30000

    def test_apply_overrides(self):
        @dataclasses.dataclass
        class C:
            a: int = 1
            b: float = 2.0

        c = apply_overrides(C(), {"a": 5, "zzz": 9})
        assert c.a == 5 and c.b == 2.0
        with pytest.raises(KeyError):
            apply_overrides(C(), {"zzz": 9}, strict=True)

    def test_run_config_roundtrip(self, tmp_path):
        @dataclasses.dataclass
        class C:
            a: int = 1

        save_run_config(str(tmp_path), model=C(a=7), extra={"x": 1})
        back = load_run_config(str(tmp_path))
        assert back["model"]["a"] == 7
        assert back["extra"]["x"] == 1


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer()
        with t.time("a"):
            pass
        with t.time("a"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
        assert "a" in t.report()

    def test_metrics_logger(self, tmp_path):
        m = MetricsLogger(str(tmp_path), use_tensorboard=False)
        m.log(1, {"loss": 0.5})
        m.log(2, {"loss": 0.25})
        m.close()
        lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
        assert len(lines) == 2
        assert json.loads(lines[1])["loss"] == 0.25


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
