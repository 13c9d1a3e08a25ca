"""Pluggable MetadataStore (VERDICT r8 #7, r9 #3): the commit protocol
must be store-agnostic — the same battery runs against the default
local (POSIX flock/rename) store, an in-memory manifest store, AND an
S3-conditional-PUT-shaped store (If-Match / If-None-Match etags,
paginated list-prefix, create-only claim PUTs); injected If-Match
conflicts must drive exactly the retry / ConcurrentWriteError behavior
the flock version had."""

from __future__ import annotations

import pytest

from openaq_data_pipeline_engineering_spark.operators.metastore import (
    InMemoryMetadataStore,
    LocalMetadataStore,
    MetadataConflictError,
    S3ConditionalMetadataStore,
    get_metadata_store,
    set_metadata_store,
)
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    ConcurrentWriteError,
    append_rows,
    clone_snapshot,
    read_snapshot,
    restore_snapshot,
    snapshot_modes,
    snapshot_versions,
    vacuum_snapshots,
    write_snapshot,
)


@pytest.fixture(params=["local", "memory", "s3"])
def store(request):
    s = {
        "local": LocalMetadataStore,
        "memory": InMemoryMetadataStore,
        "s3": S3ConditionalMetadataStore,
    }[request.param]()
    prev = set_metadata_store(s)
    try:
        yield s
    finally:
        set_metadata_store(prev)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestProtocolIsStoreAgnostic:
    def test_commit_append_time_travel_vacuum(self, spark, tmp_path, store):
        root = str(tmp_path / "t")
        v1 = write_snapshot(_df(spark, [(1, "a")]), root)
        v2 = append_rows(_df(spark, [(2, "b")]), root)
        v3 = write_snapshot(_df(spark, [(9, "z")]), root)
        assert (v1, v2, v3) == (1, 2, 3)
        assert snapshot_versions(root) == [1, 2, 3]
        assert snapshot_modes(root) == {2: "delta"}
        assert _rows(read_snapshot(spark, root)) == {(9, "z")}
        assert _rows(read_snapshot(spark, root, version=2)) == {
            (1, "a"),
            (2, "b"),
        }
        assert vacuum_snapshots(root, keep_last=1) == [1, 2]
        assert snapshot_versions(root) == [3]
        assert _rows(read_snapshot(spark, root)) == {(9, "z")}

    def test_txn_dedupe_and_idempotent_replay(self, spark, tmp_path, store):
        root = str(tmp_path / "t")
        v = write_snapshot(_df(spark, [(1, "a")]), root, txn_id="batch-0")
        replay = write_snapshot(
            _df(spark, [(1, "DIFFERENT")]), root, txn_id="batch-0"
        )
        assert replay == v
        assert snapshot_versions(root) == [v]
        assert _rows(read_snapshot(spark, root)) == {(1, "a")}

    def test_restore_and_clone(self, spark, tmp_path, store):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        write_snapshot(_df(spark, [(2, "b")]), root)
        rv = restore_snapshot(root, version=1)
        assert snapshot_modes(root)[rv] == "restore:1"
        assert _rows(read_snapshot(spark, root)) == {(1, "a")}
        dst = str(tmp_path / "c")
        pinned = clone_snapshot(root, dst, version=2)
        assert pinned == 2
        assert _rows(read_snapshot(spark, dst)) == {(2, "b")}

    def test_expected_latest_conflict_surfaces(self, spark, tmp_path, store):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)  # v1
        write_snapshot(_df(spark, [(2, "b")]), root)  # v2: table advanced
        with pytest.raises(ConcurrentWriteError, match="advanced"):
            write_snapshot(_df(spark, [(3, "c")]), root, expected_latest=1)

    def test_threaded_writers_still_linearize(self, spark, tmp_path, store):
        import threading

        root = str(tmp_path / "t")
        got: dict[int, int] = {}
        errs: list[BaseException] = []
        lock = threading.Lock()

        def writer(i: int):
            try:
                v = write_snapshot(_df(spark, [(i, "w")]), root)
                with lock:
                    got[i] = v
            except BaseException as e:  # pragma: no cover
                errs.append(e)

        threads = [
            threading.Thread(target=writer, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        versions = sorted(got.values())
        assert len(set(versions)) == 4
        assert snapshot_versions(root) == versions  # no lost update
        for i, v in got.items():
            assert _rows(read_snapshot(spark, root, version=v)) == {(i, "w")}


class TestInjectedConflicts:
    def test_cas_conflict_retries_and_commit_lands(self, spark, tmp_path):
        """A transient If-Match failure (another writer's PUT won) must
        be retried by the transaction loop, not surfaced — S3 parity
        for the old flock re-read."""
        s = InMemoryMetadataStore()
        prev = set_metadata_store(s)
        try:
            root = str(tmp_path / "t")
            write_snapshot(_df(spark, [(1, "a")]), root)
            s.fail_next_writes = 2
            v = append_rows(_df(spark, [(2, "b")]), root)
            assert s.cas_conflicts_seen >= 2
            assert v in snapshot_versions(root)
            assert _rows(read_snapshot(spark, root)) == {(1, "a"), (2, "b")}
        finally:
            set_metadata_store(prev)

    def test_competing_commit_drives_concurrent_write_error(
        self, spark, tmp_path
    ):
        """The optimistic-concurrency contract end-to-end through the
        store: a competing commit landing between this writer's read
        and its conditional PUT makes the expected_latest commit fail
        with ConcurrentWriteError — never a silent lost update."""
        s = InMemoryMetadataStore()
        prev = set_metadata_store(s)
        try:
            root = str(tmp_path / "t")
            write_snapshot(_df(spark, [(1, "a")]), root)  # v1
            racer = _df(spark, [(7, "racer")])

            def compete(_root, _data):
                # a full competing commit wins the CAS first
                write_snapshot(racer, root)

            s.before_write = compete
            with pytest.raises(ConcurrentWriteError, match="advanced"):
                write_snapshot(
                    _df(spark, [(2, "mine")]), root, expected_latest=1
                )
            # the racer's commit is intact; the loser wrote nothing
            assert _rows(read_snapshot(spark, root)) == {(7, "racer")}
        finally:
            set_metadata_store(prev)

    def test_store_restored_after_fixture(self):
        assert isinstance(get_metadata_store(), LocalMetadataStore)


class TestStatementRoutingUnderStore:
    def test_optimize_routes_versioned_root_without_manifest_file(
        self, spark, tmp_path
    ):
        """OPTIMIZE must detect a versioned root THROUGH the store: with
        an in-memory manifest there is no _VERSIONS.json on disk, and
        the plain-table path would union every v=<N> dir as data."""
        from openaq_data_pipeline_engineering_spark.engine import Engine

        s = InMemoryMetadataStore()
        prev = set_metadata_store(s)
        try:
            root = str(tmp_path / "t")
            write_snapshot(_df(spark, [(1, "a")]), root)
            append_rows(_df(spark, [(2, "b")]), root)
            m = Engine(spark).sql(f"OPTIMIZE '{root}'").first()
            assert m["n_rows"] == 2  # snapshot-protocol route, not plain
            assert _rows(read_snapshot(spark, root)) == {(1, "a"), (2, "b")}
        finally:
            set_metadata_store(prev)


class TestDelete:
    def test_delete_removes_manifest_and_is_idempotent(
        self, tmp_path, store
    ):
        root = str(tmp_path / "d")
        store.write(root, b"{}")
        assert store.read(root)[0] == b"{}"
        store.delete(root)
        assert store.read(root) == (None, None)
        store.delete(root)  # absent manifest: a no-op, not an error
        assert store.read(root) == (None, None)


class TestConvertUnderStore:
    def test_versionize_table_is_store_agnostic(
        self, spark, tmp_path, store
    ):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            read_snapshot,
            snapshot_versions,
            versionize_table,
        )

        root = str(tmp_path / "c")
        _df(spark, [(1, "a"), (2, "b")]).write.parquet(root)
        assert versionize_table(root) == 1
        assert snapshot_versions(root) == [1]
        assert _rows(read_snapshot(spark, root)) == {(1, "a"), (2, "b")}
        # adopted root takes ordinary commits through the same store
        append_rows(_df(spark, [(3, "c")]), root)
        assert _rows(read_snapshot(spark, root)) == {
            (1, "a"),
            (2, "b"),
            (3, "c"),
        }


class TestS3ConditionalStore:
    """The S3-API-shaped backend specifically (VERDICT r9 #3): etag
    generations, create-only PUT races, paginated LIST, injected 412s,
    and the threaded-writer protocol under injected latency."""

    def _with(self, s):
        import contextlib

        @contextlib.contextmanager
        def ctx():
            prev = set_metadata_store(s)
            try:
                yield s
            finally:
                set_metadata_store(prev)

        return ctx()

    def test_etag_is_generation_not_content(self, tmp_path):
        """ABA cannot satisfy a stale If-Match: rewriting the ORIGINAL
        bytes still advances the etag (stronger than the local store's
        content hash — true server-assigned versioning)."""
        s = S3ConditionalMetadataStore()
        root = str(tmp_path / "t")
        e1 = s.write(root, b"{}")
        _, e_read = s.read(root)
        assert e_read == e1
        e2 = s.write(root, b'{"versions": [1]}')
        e3 = s.write(root, b"{}")  # ABA: same bytes as the first write
        assert len({e1, e2, e3}) == 3
        with pytest.raises(MetadataConflictError):
            s.write_if_match(root, b"x", e1)  # stale despite same content

    def test_create_only_put_race_has_one_winner(self, tmp_path):
        import threading

        s = S3ConditionalMetadataStore()
        root = str(tmp_path / "t")
        wins: list[int] = []
        barrier = threading.Barrier(8)

        def claim(i: int):
            barrier.wait()
            if s.claim_version_dir(root, 1):
                wins.append(i)

        ts = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1
        assert s.list_version_dirs(root) == [1]

    def test_list_prefix_paginates(self, tmp_path):
        s = S3ConditionalMetadataStore()
        root = str(tmp_path / "t")
        for v in range(1, 8):
            assert s.claim_version_dir(root, v)
        pages_before = s.list_pages
        assert s.list_version_dirs(root) == list(range(1, 8))
        # 7 claim keys at PAGE_SIZE=2 -> at least 4 continuation pages
        assert s.list_pages - pages_before >= 4

    def test_injected_412_retries_through_txn_loop(self, spark, tmp_path):
        s = S3ConditionalMetadataStore()
        with self._with(s):
            root = str(tmp_path / "t")
            write_snapshot(_df(spark, [(1, "a")]), root)
            # injections fire on the next PUTs (claim PUT + manifest
            # PUT both count); the protocol must absorb them
            s.fail_next_writes = 2
            v = append_rows(_df(spark, [(2, "b")]), root)
            assert s.cas_conflicts_seen >= 2
            assert v in snapshot_versions(root)
            assert _rows(read_snapshot(spark, root)) == {(1, "a"), (2, "b")}

    def test_competing_commit_drives_conflict_error(self, spark, tmp_path):
        s = S3ConditionalMetadataStore()
        with self._with(s):
            root = str(tmp_path / "t")
            write_snapshot(_df(spark, [(1, "a")]), root)  # v1
            racer = _df(spark, [(7, "racer")])

            def compete(_root, _data):
                write_snapshot(racer, root)

            s.before_write = compete
            with pytest.raises(ConcurrentWriteError, match="advanced"):
                write_snapshot(
                    _df(spark, [(2, "mine")]), root, expected_latest=1
                )
            assert _rows(read_snapshot(spark, root)) == {(7, "racer")}

    def test_threaded_writers_under_latency(self, spark, tmp_path):
        """The linearization suite with a per-op RTT: the widened
        read→decide→conditional-PUT windows force real CAS conflicts
        and every commit must still land exactly once."""
        import threading

        s = S3ConditionalMetadataStore(latency_seconds=0.02)
        with self._with(s):
            root = str(tmp_path / "t")
            got: dict[int, int] = {}
            errs: list[BaseException] = []
            lock = threading.Lock()

            def writer(i: int):
                try:
                    v = write_snapshot(
                        _df(spark, [(i, "w")]), root, txn_id=f"w-{i}"
                    )
                    with lock:
                        got[i] = v
                except BaseException as e:  # pragma: no cover
                    errs.append(e)

            ts = [
                threading.Thread(target=writer, args=(i,)) for i in range(4)
            ]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert not errs, errs
            versions = sorted(got.values())
            assert len(set(versions)) == 4
            assert snapshot_versions(root) == versions
            # txn dedupe: replaying any writer's txn is a no-op
            replay = write_snapshot(
                _df(spark, [(0, "REPLAY")]), root, txn_id="w-0"
            )
            assert replay == got[0]
            assert snapshot_versions(root) == versions
