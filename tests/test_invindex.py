"""Inverted-index sink: postings correctness, atomic-commit resume."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nrt_ray.pipelines.invindex import (build_inverted_index, read_index)

SF_DIR = "/root/testdata/sf0.001"


def _direct_postings():
    """Reference postings from a straight pandas pass."""
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    post = {}
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for w in txt.split():
            post.setdefault(w, {}).setdefault(did, 0)
            post[w][did] += 1
    return post


def test_index_matches_direct_and_resumes(ray_session, tmp_path):
    out = str(tmp_path / "idx")
    s1 = build_inverted_index(SF_DIR, out, num_partitions=4)
    assert s1 == {"partitions_processed": 4, "partitions_skipped": 0}

    idx = read_index(out).to_pandas()
    ref = _direct_postings()
    assert len(idx) == len(ref)
    for _, row in idx.iterrows():
        exp = ref[row["token"]]
        got = dict(zip(row["doc_ids"], row["tfs"]))
        assert got == exp, row["token"]
        assert list(row["doc_ids"]) == sorted(row["doc_ids"])
        assert row["df"] == len(exp)

    # full resume: nothing recomputed
    s2 = build_inverted_index(SF_DIR, out, num_partitions=4)
    assert s2 == {"partitions_processed": 0, "partitions_skipped": 4}

    # partial resume: drop one commit record -> exactly one partition
    # rebuilt, content identical
    os.remove(os.path.join(out, "manifest", "partition-00002.json"))
    s3 = build_inverted_index(SF_DIR, out, num_partitions=4)
    assert s3 == {"partitions_processed": 1, "partitions_skipped": 3}
    again = read_index(out).to_pandas().sort_values("token") \
        .reset_index(drop=True)
    idx = idx.sort_values("token").reset_index(drop=True)
    assert again["token"].tolist() == idx["token"].tolist()
    assert (again["df"] == idx["df"]).all()

    # partition-count pinning
    with pytest.raises(ValueError):
        build_inverted_index(SF_DIR, out, num_partitions=8)
