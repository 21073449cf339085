from __future__ import annotations

import datetime as _dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Hypothesis seed diversity: default --hypothesis-seed to a value that
# rotates with the ISO week (override via HYPOTHESIS_SEED or the CLI
# flag) so each CI window explores a different slice of the strategy
# space instead of replaying one fixed path forever — the F2
# Java-suffix divergence sat latent for 8 rounds because no replayed
# path ever generated a suffixed literal.
_HYP_SEED = os.environ.get(
    "HYPOTHESIS_SEED", str(_dt.date.today().isocalendar()[1])
)


def pytest_configure(config):
    try:
        if config.getoption("--hypothesis-seed", default=None) in (None, ""):
            config.option.hypothesis_seed = _HYP_SEED
    except ValueError:  # hypothesis pytest plugin not loaded
        pass

from train_reports_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
