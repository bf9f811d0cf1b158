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
