"""Driver-contract regression: the REAL driver ray.init()s first, then
imports __ray_entry__ by file spec from a foreign cwd with the repo NOT on
sys.path — so workers must unpickle every UDF by value. A function-body
relative import inside any map_batches UDF breaks ONLY in this scenario
(pytest itself can't see it: the repo is on sys.path here), which is how a
round-4 regression slipped past the whole suite. This test reproduces the
driver's exact import sequence in a clean subprocess."""

from __future__ import annotations

import os
import subprocess
import sys

_DRIVER = r"""
import warnings; warnings.filterwarnings("ignore")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import importlib.util
spec = importlib.util.spec_from_file_location(
    "__ray_entry__", "/root/repo/__ray_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
assert m.entry().count() > 0
assert set(m.oracle_sql()) <= set(m.queries())
print("CONTRACT_OK")
ray.shutdown()
"""


def test_hostile_cwd_driver_contract(tmp_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["RAY_ADDRESS"] = "local"
    out = subprocess.run([sys.executable, "-c", _DRIVER], cwd=str(tmp_path),
                         env=env, capture_output=True, text=True,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "CONTRACT_OK" in out.stdout
