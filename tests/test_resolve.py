"""Checkpoint bootstrap (ckpt/resolve.py): manifest parsing, MD5
verification, and LANDIFF_HOME resolution — the reference's
initialize_landiff_model_path contract (landiff/utils.py:23-217,
landiff/__init__.py:14-29) exercised against temp dirs (no network)."""

import hashlib

import pytest

from landiff_tpu.ckpt import resolve


def _make_tree(root, files):
    lines = []
    for rel, content in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(content)
        lines.append(f"{hashlib.md5(content).hexdigest()}  ./{rel}")
    (root / "CHECKSUM.md5").write_text("\n".join(lines) + "\n")


def test_parse_md5_manifest(tmp_path):
    f = tmp_path / "m.md5"
    f.write_text("abc123  ./a/b.bin\n\ndef456  c.safetensors\n")
    m = resolve.parse_md5_manifest(f)
    assert m == {"a/b.bin": "abc123", "c.safetensors": "def456"}


def test_verify_md5_ok_and_corrupt(tmp_path):
    _make_tree(tmp_path, {"w/a.bin": b"hello", "b.bin": b"world" * 100})
    assert resolve.verify_md5_checksum(
        tmp_path, tmp_path / "CHECKSUM.md5") is True
    (tmp_path / "b.bin").write_bytes(b"tampered")
    assert resolve.verify_md5_checksum(
        tmp_path, tmp_path / "CHECKSUM.md5") is False


def test_verify_md5_missing_file(tmp_path):
    _make_tree(tmp_path, {"a.bin": b"x"})
    (tmp_path / "a.bin").unlink()
    assert resolve.verify_md5_checksum(
        tmp_path, tmp_path / "CHECKSUM.md5") is False


def test_verify_md5_no_manifest(tmp_path):
    with pytest.raises(FileNotFoundError):
        resolve.verify_md5_checksum(tmp_path, tmp_path / "nope.md5")


def test_initialize_resolves_landiff_home(tmp_path, monkeypatch):
    """LANDIFF_HOME wins; the in-model-dir manifest is honored; the
    workspace symlink lands at <repo>/ckpts/LanDiff."""
    model = tmp_path / "model"
    model.mkdir()
    _make_tree(model, {"stage1.pt": b"s1" * 10, "vae/v.bin": b"v" * 7})
    repo = tmp_path / "repo"
    (repo / "ckpts").mkdir(parents=True)
    monkeypatch.setattr(resolve, "_repo_root", lambda: repo)
    monkeypatch.setattr(resolve, "_MODEL_PATH", None)
    monkeypatch.setenv("LANDIFF_HOME", str(model))
    got = resolve.initialize_landiff_model_path()
    assert got == model
    link = repo / "ckpts" / "LanDiff"
    assert link.is_symlink() and link.resolve() == model.resolve()
    # cached on second call
    assert resolve.initialize_landiff_model_path() == model


def test_initialize_skip_hash(tmp_path, monkeypatch):
    """LANDIFF_SKIP_HASH_CHECK accepts a dir with NO manifest at all."""
    model = tmp_path / "model"
    model.mkdir()
    (model / "anything.bin").write_bytes(b"x")
    repo = tmp_path / "repo"
    (repo / "ckpts").mkdir(parents=True)
    monkeypatch.setattr(resolve, "_repo_root", lambda: repo)
    monkeypatch.setattr(resolve, "_MODEL_PATH", None)
    monkeypatch.setenv("LANDIFF_HOME", str(model))
    monkeypatch.setenv("LANDIFF_SKIP_HASH_CHECK", "1")
    assert resolve.initialize_landiff_model_path() == model


def test_initialize_rejects_corrupt_then_no_fallback(tmp_path, monkeypatch):
    """A corrupt LANDIFF_HOME is refused (and with no network the HF
    fallback raises rather than silently accepting bad weights)."""
    model = tmp_path / "model"
    model.mkdir()
    _make_tree(model, {"a.bin": b"good"})
    (model / "a.bin").write_bytes(b"bad!")
    repo = tmp_path / "repo"
    (repo / "ckpts").mkdir(parents=True)
    monkeypatch.setattr(resolve, "_repo_root", lambda: repo)
    monkeypatch.setattr(resolve, "_MODEL_PATH", None)
    monkeypatch.setenv("LANDIFF_HOME", str(model))
    monkeypatch.delenv("LANDIFF_SKIP_HASH_CHECK", raising=False)

    def no_download(**kw):
        raise OSError("no network")

    import sys
    import types

    fake = types.ModuleType("huggingface_hub")
    fake.snapshot_download = no_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    with pytest.raises(OSError):
        resolve.initialize_landiff_model_path()
