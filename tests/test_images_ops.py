"""Multimodal image-payload pipelines (rows-only surfaces).

The oracled invariants (decode/dims/phash vs the fixture parquet) are
covered by test_entry_oracle; these cover the non-SQL-expressible
surfaces: near-dup pairing, embeddings, and determinism across runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.ops import images_ops as io


def test_phash_neardup_symmetric_and_thresholded(ray_session):
    pairs = io.image_phash_neardup("x", max_hamming=12)
    assert list(pairs.columns) == ["id_a", "id_b", "hamming"]
    assert (pairs["hamming"] <= 12).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    # widening the threshold can only add pairs
    wider = io.image_phash_neardup("x", max_hamming=20)
    assert len(wider) >= len(pairs)


def test_embeddings_deterministic(ray_session):
    a = io.image_embeddings("x")
    b = io.image_embeddings("x")
    assert len(a) == len(b) > 0
    assert all(len(v) == 16 for v in a["embedding"])
    assert a["image_id"].tolist() == b["image_id"].tolist()
    assert a["embedding"].map(tuple).tolist() == b["embedding"].map(tuple).tolist()
    # unit-ish range from the luminance pooling
    assert all(0.0 <= x <= 1.0 for v in a["embedding"] for x in v)


def test_image_caption_sim_streaming_deterministic(ray_session):
    from forum_dl_ray.ops.images_ops import image_caption_sim

    a = image_caption_sim("unused")
    b = image_caption_sim("unused")
    assert a.equals(b)
    assert list(a.columns) == ["image_id", "sim_e4"]
    assert len(a) > 0
    assert (a["sim_e4"].abs() <= 10000).all()
    assert a["sim_e4"].nunique() > 1  # scores vary across pairs


def test_lance_seam_is_import_gated(ray_session):
    """The north rule's native layout is a Lance table; the container
    lacks the lance package, so the .lance branch of the image-table
    reader must fail loudly with guidance (not an AttributeError deep
    in ray.data), while parquet paths are untouched."""
    import pytest

    from forum_dl_ray.ops.images_ops import _read_images

    with pytest.raises(ImportError, match="lance"):
        _read_images(src="/tmp/nonexistent_table.lance")
    # parquet default path unaffected
    assert _read_images(columns=["image_id"]).count() > 0
