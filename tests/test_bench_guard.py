"""Derived-corpus spec guard (VERDICT r09 #8): corpora under /tmp outlive
a round and must be spec-validated before reuse — bench_sf1 regenerates on
any mismatch (source files, copy count, recipe version)."""

import json
import os
import shutil


def _load_tool():
    import importlib.util
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_sf1_under_test", os.path.join(repo, "tools", "bench_sf1.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_sf1_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_corpus_spec_guard(tmp_path, monkeypatch, sf_dir):
    mod = _load_tool()
    dst = tmp_path / "corpus"
    dst.mkdir()
    monkeypatch.setattr(mod, "SRC", sf_dir)
    monkeypatch.setattr(mod, "DST", str(dst))

    # no corpus at all -> not reusable
    assert not mod._corpus_reusable()

    # corpus present but UNSTAMPED (legacy, pre-spec) -> not reusable
    (dst / "lineitem.parquet").write_bytes(b"x")
    assert not mod._corpus_reusable()

    # stamped with the CURRENT spec -> reusable
    with open(dst / "_SPEC.json", "w") as f:
        json.dump(mod._corpus_spec(), f)
    assert mod._corpus_reusable()

    # a different copy count -> spec mismatch -> regenerate
    stale = mod._corpus_spec()
    stale["copies"] = stale["copies"] + 1
    with open(dst / "_SPEC.json", "w") as f:
        json.dump(stale, f)
    assert not mod._corpus_reusable()

    # source files changed (size/mtime fingerprint) -> regenerate
    src2 = tmp_path / "src2"
    src2.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", src2 / f"{t}.parquet")
    with open(dst / "_SPEC.json", "w") as f:
        json.dump(mod._corpus_spec(), f)
    monkeypatch.setattr(mod, "SRC", str(src2))
    assert not mod._corpus_reusable()
