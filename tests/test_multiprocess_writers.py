"""Cross-PROCESS multi-writer stress (VERDICT r9 #4).

The concurrency suites race threads inside one driver; the flock/CAS
story claims cross-process safety. Here N separate Python processes
commit M append versions each to ONE root through the default
LocalMetadataStore — no Spark in the workers (pyarrow writes the data
files; the protocol's claim/commit primitives are process-agnostic), so
the test exercises exactly the cross-process surface: flock'd
compare-and-swap manifest publishes and mkdir claims racing across
process boundaries.

Pinned outcomes: exactly N×M committed versions, every txn id recorded
once, no lost update (every worker's every batch readable in the final
chain), and a full-committer process retrying expected_latest conflicts
still linearizes against the appenders.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

from openaq_data_pipeline_engineering_spark.operators.versioned import (
    _read_manifest_full,
    read_snapshot,
    snapshot_modes,
    snapshot_versions,
    write_snapshot,
)

_WORKER = textwrap.dedent(
    """
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    from openaq_data_pipeline_engineering_spark.operators.metastore import (
        get_metadata_store,
    )
    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        _commit_version,
        _existing_version_dirs,
        _OutOfOrderCommitRejected,
        _read_manifest,
    )

    root, wid, m = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    store = get_metadata_store()
    for i in range(m):
        # the same allocate-claim-write-commit protocol append_rows
        # runs (including its out-of-order re-allocation retry), with
        # pyarrow as the data plane
        for _ in range(200):
            cand = max(
                _read_manifest(root) + _existing_version_dirs(root),
                default=0,
            ) + 1
            if not store.claim_version_dir(root, cand):
                continue  # lost the claim race: recompute
            pq.write_table(
                pa.table({"worker": [wid], "batch": [i]}),
                f"{root}/v={cand}/part-0.parquet",
            )
            try:
                committed = _commit_version(
                    root, cand, txn_id=f"w{wid}-b{i}", mode="delta"
                )
            except _OutOfOrderCommitRejected:
                continue  # a racer committed above; re-allocate
            assert committed == cand, (committed, cand)
            break
        else:
            raise SystemExit(f"worker {wid}: claim starvation")
    print(f"worker {wid} done")
    """
)


def _spawn(args: list[str]) -> subprocess.Popen:
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    )
    return subprocess.Popen(
        [sys.executable, "-c", _WORKER, *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
        text=True,
    )


class TestCrossProcessWriters:
    N, M = 4, 6

    def test_n_processes_times_m_commits_yield_exactly_nm_versions(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "mp")
        os.makedirs(root)
        procs = [
            _spawn([root, str(w), str(self.M)]) for w in range(self.N)
        ]
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        versions, txns = _read_manifest_full(root)
        assert len(versions) == self.N * self.M
        assert versions == sorted(versions)
        assert len(txns) == self.N * self.M  # every txn recorded once
        assert set(txns.values()) == set(versions)  # bijective
        modes = snapshot_modes(root)
        assert all(modes.get(v) == "delta" for v in versions)
        # no lost update: the latest chain holds every worker's every
        # batch exactly once
        rows = {
            (r["worker"], r["batch"])
            for r in read_snapshot(spark, root).collect()
        }
        assert rows == {
            (w, b) for w in range(self.N) for b in range(self.M)
        }
        assert read_snapshot(spark, root).count() == self.N * self.M

    def test_full_committer_linearizes_against_process_appenders(
        self, spark, tmp_path
    ):
        """A read-modify-write full commit (expected_latest, the
        checkpoint/DML shape) retries its conflicts against appender
        PROCESSES and never erases their commits."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            ConcurrentWriteError,
        )

        root = str(tmp_path / "mp2")
        write_snapshot(
            spark.createDataFrame(
                [(99, -1)], "worker bigint, batch bigint"
            ),  # bigint: pyarrow's int64, so chains schema-match
            root,
        )
        procs = [_spawn([root, str(w), "4"]) for w in range(2)]
        # interleave conditional full commits while workers run
        landed = 0
        while any(p.poll() is None for p in procs) or landed == 0:
            base = snapshot_versions(root)[-1]
            content = read_snapshot(spark, root, version=base)
            try:
                write_snapshot(content, root, expected_latest=base)
                landed += 1
            except ConcurrentWriteError:
                continue  # an appender process won; retry
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        # every appended batch survives every checkpoint
        rows = {
            (r["worker"], r["batch"])
            for r in read_snapshot(spark, root).collect()
        }
        assert {(w, b) for w in range(2) for b in range(4)} <= rows
        assert (99, -1) in rows
