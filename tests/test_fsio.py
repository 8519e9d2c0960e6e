"""fsio facade: the metadata tier's single filesystem seam.

Round-10 contract (VERDICT r9 item 1): every manifest/bloom/agg
read-write, compaction/delete staging move, and active-file listing
goes through ``sources.fsio`` (pyarrow.fs) — LocalFileSystem today,
S3/HDFS by URI on a cluster — so the zonemap layer's object-store
claims are executable. The injection test further down
(tests/test_pipeline_ops.py::TestSkippingFacade) drives a full
save/append/compact/delete cycle through a SubTreeFileSystem.
"""

import os

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq
import pytest

from hadoopgis_spark.sources import fsio


class TestFsioFacade:
    def test_roundtrip_and_listing(self, tmp_path):
        d = str(tmp_path)
        fsio.makedirs(os.path.join(d, "t/sub"))
        fsio.write_bytes_atomic(os.path.join(d, "t/rec.json"), b'{"a":1}')
        assert fsio.read_bytes(os.path.join(d, "t/rec.json")) == b'{"a":1}'
        assert fsio.exists(os.path.join(d, "t/rec.json"))
        assert fsio.is_dir(os.path.join(d, "t/sub"))
        entries = fsio.listdir_stat(os.path.join(d, "t"))
        names = [n for n, _, _, _ in entries]
        assert names == ["rec.json", "sub"]
        rec = dict((n, (sz, dir_)) for n, sz, _, dir_ in entries)
        assert rec["rec.json"][0] == 7 and rec["rec.json"][1] is False
        assert rec["sub"][1] is True

    def test_rename_overwrites_like_os_replace(self, tmp_path):
        d = str(tmp_path)
        fsio.write_bytes_atomic(os.path.join(d, "a"), b"A")
        fsio.write_bytes_atomic(os.path.join(d, "b"), b"B")
        fsio.rename(os.path.join(d, "a"), os.path.join(d, "b"))
        assert fsio.read_bytes(os.path.join(d, "b")) == b"A"
        assert not fsio.exists(os.path.join(d, "a"))

    def test_missing_paths_raise_filenotfound(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            fsio.listdir(str(tmp_path / "nope"))
        with pytest.raises(FileNotFoundError):
            fsio.read_bytes(str(tmp_path / "nope.json"))

    def test_parquet_footer_and_table_reads(self, tmp_path):
        p = str(tmp_path / "p.parquet")
        pq.write_table(pa.table({"x": [1, 2, 3]}), p)
        assert fsio.read_metadata(p).num_rows == 3
        assert fsio.read_table([p]).num_rows == 3
        assert fsio.read_table(str(tmp_path), columns=["x"]).num_rows == 3

    def test_subtree_injection_strips_prefix(self, tmp_path):
        d = str(tmp_path)
        fsio.write_bytes_atomic(os.path.join(d, "seed"), b"s")
        sub = pafs.SubTreeFileSystem(d, pafs.LocalFileSystem())
        with fsio.use_filesystem(sub, prefix=d):
            assert fsio.listdir(d) == ["seed"]
            fsio.write_bytes_atomic(os.path.join(d, "via_sub"), b"v")
            fsio.rename(os.path.join(d, "via_sub"), os.path.join(d, "v2"))
        # the override is scoped: default resolution sees the same bytes
        assert fsio.read_bytes(os.path.join(d, "v2")) == b"v"
        assert fsio._OVERRIDE is None
