"""Session config: the fast shuffle-scratch selection (r14 optimization).

`_fast_local_dir` decides where spark.local.dir points in LOCAL mode:
tmpfs when it has headroom (the measured 2x stage-latency win on this
sandbox's slow-writeback disk), Spark's default otherwise, with
SPARK_GRAFT_LOCAL_DIR overriding in both directions. Pure-python tests —
the SparkSession itself is driver-owned in production, so nothing here
may be load-bearing for correctness (the driver contract runs on a
vanilla session).
"""

from __future__ import annotations

import os

from aws_etl_microservice_redshift_datalake_spark.session import _fast_local_dir


def test_env_override_wins(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(tmp_path))
    assert _fast_local_dir() == str(tmp_path)


def test_env_empty_forces_spark_default(monkeypatch):
    # '' means "use Spark's default scratch" even when tmpfs is available
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "")
    assert _fast_local_dir() is None


def test_default_is_tmpfs_or_none(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    d = _fast_local_dir()
    if d is not None:
        # when tmpfs qualifies, the directory must exist and be writable
        assert d.startswith("/dev/shm/")
        assert os.path.isdir(d) and os.access(d, os.W_OK)
