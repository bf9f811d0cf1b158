"""FsUtil parity tests — mirrors the reference's filesystem matrix
(reference tests/test_filesystem.py:60-110: ls/rm/cp round trip,
created/modified datetimes, sign error paths) on the local backend."""

from __future__ import annotations

import datetime

import pytest

from data_toolz_spark.fs import FsUtil


@pytest.fixture()
def fs(spark):
    return FsUtil(spark)


def _touch(tmp_path, name, data=b"x"):
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_ls_detail_and_names(fs, tmp_path):
    _touch(tmp_path, "a.txt", b"aa")
    (tmp_path / "sub").mkdir()
    details = fs.ls(str(tmp_path))
    assert {d["name"].rsplit("/", 1)[1] for d in details} == {"a.txt", "sub"}
    by_name = {d["name"].rsplit("/", 1)[1]: d for d in details}
    assert by_name["a.txt"]["type"] == "file"
    assert by_name["a.txt"]["size"] == 2
    assert by_name["sub"]["type"] == "directory"
    assert isinstance(by_name["a.txt"]["modified"], datetime.datetime)
    names = fs.ls(str(tmp_path), detail=False)
    assert sorted(n.rsplit("/", 1)[1] for n in names) == ["a.txt", "sub"]


def test_rm_file_and_recursive_dir(fs, tmp_path):
    path = _touch(tmp_path, "gone.txt")
    assert fs.rm(path) is True
    assert not fs.exists(path)
    d = tmp_path / "dir"
    d.mkdir()
    _touch(d, "x.txt")
    assert fs.rm(str(d), recursive=True) is True
    assert not fs.exists(str(d))
    # reference name survives as an alias (filesystem.py:108)
    path2 = _touch(tmp_path, "gone2.txt")
    assert fs._rm(path2) is True


def test_cp_file_round_trip(fs, tmp_path):
    src = _touch(tmp_path, "src.bin", b"payload")
    dst = str(tmp_path / "dst.bin")
    fs.cp_file(src, dst)
    assert fs.open(dst).read() == b"payload"


def test_created_modified_local(fs, tmp_path):
    path = _touch(tmp_path, "t.txt")
    assert isinstance(fs.created(path), datetime.datetime)
    mod = fs.modified(path)
    assert isinstance(mod, datetime.datetime)
    now = datetime.datetime.now(tz=datetime.timezone.utc)
    assert abs((now - mod).total_seconds()) < 300


def test_created_s3_not_implemented(fs):
    with pytest.raises(NotImplementedError):
        fs.created("s3a://bucket/key")


def test_sign_local_not_implemented(fs, tmp_path):
    # reference behavior: sign on the local backend raises
    # (tests/test_filesystem.py:109-110)
    with pytest.raises(NotImplementedError):
        fs.sign(_touch(tmp_path, "s.txt"))


def test_open_write_read(fs, tmp_path):
    path = str(tmp_path / "w.bin")
    with fs.open(path, "wb") as fo:
        fo.write(b"abc123")
    assert fs.open(path).read() == b"abc123"


def test_fsid_is_stable_string(fs):
    assert isinstance(fs.fsid, str)
    assert fs.fsid == fs.fsid


def test_glob_find_du_size_predicates(fs, tmp_path):
    """r11: the widened Hadoop-served surface (glob/find/du/size/
    isfile/isdir/cat/touch) — the methods the reference gets via FS5
    fsspec delegation, served by the Hadoop FileSystem instead."""
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.txt").write_bytes(b"12345")
    (tmp_path / "a" / "y.txt").write_bytes(b"678")
    (tmp_path / "a" / "z.log").write_bytes(b"9")
    (tmp_path / "b").mkdir()
    (tmp_path / "b" / "w.txt").write_bytes(b"00")

    got = fs.glob(str(tmp_path / "a" / "*.txt"))
    assert [g.rsplit("/", 1)[1] for g in got] == ["x.txt", "y.txt"]
    assert fs.glob(str(tmp_path / "nope" / "*")) == []
    d = fs.glob(str(tmp_path / "a" / "*.log"), detail=True)
    assert d[0]["size"] == 1 and d[0]["type"] == "file"

    found = fs.find(str(tmp_path))
    # sorted by FULL path: a/* before b/*
    assert [f.rsplit("/", 1)[1] for f in found] == [
        "x.txt", "y.txt", "z.log", "w.txt",
    ]
    assert fs.du(str(tmp_path)) == 11
    per = fs.du(str(tmp_path / "a"), total=False)
    assert set(per.values()) == {5, 3, 1}
    assert fs.size(str(tmp_path / "a" / "x.txt")) == 5
    assert fs.isfile(str(tmp_path / "a" / "x.txt"))
    assert not fs.isfile(str(tmp_path / "a"))
    assert fs.isdir(str(tmp_path / "a"))
    assert not fs.isdir(str(tmp_path / "missing"))
    assert fs.cat(str(tmp_path / "a" / "y.txt")) == b"678"
    fs.touch(str(tmp_path / "new.bin"))
    assert fs.isfile(str(tmp_path / "new.bin"))
    assert fs.size(str(tmp_path / "new.bin")) == 0


def test_fs5_dynamic_delegation_gate(fs):
    """FS5: unknown methods resolve through fsspec when installed;
    without it the AttributeError names the gap (import-gated — this
    container has no fsspec, so the gate path is what executes)."""
    try:
        import fsspec  # noqa: F401

        have = True
    except ImportError:
        have = False
    if have:
        walked = fs.walk("/tmp")  # any fsspec method name
        assert walked is not None
    else:
        with pytest.raises(AttributeError, match="fsspec"):
            fs.walk
    # underscore names never delegate (pickle/dunder safety)
    with pytest.raises(AttributeError):
        fs._not_a_method
