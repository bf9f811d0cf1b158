"""Image perceptual-hash near-dup tier (operators/image_dedup.py).

The driver qid (multimodal_image_neardup) value-attests the planted
200-image pipeline against DuckDB; these tests pin the pieces the
oracle can't see — ragged (non-divisible) grid dims, the generic
banding's exactness on adversarial fingerprints, the components path's
parity with the pair path (including identical-hash mega-clusters),
and undecodable-blob handling.
"""

import numpy as np
import pytest

from pyspark.sql import functions as F


def _ref_phash(px: np.ndarray) -> tuple[int, int]:
    """Slow independent reference: per-pixel loops, python ints."""
    h, w, c = px.shape
    gray = [[sum(int(px[y, x, ch]) for ch in range(c)) for x in range(w)]
            for y in range(h)]
    csum = [0] * 64
    ccnt = [0] * 64
    total = 0
    for y in range(h):
        for x in range(w):
            cell = (y * 8 // h) * 8 + (x * 8 // w)
            csum[cell] += gray[y][x]
            ccnt[cell] += 1
            total += gray[y][x]
    a = 0
    for cell in range(64):
        if csum[cell] * (w * h) > total * ccnt[cell]:
            a |= 1 << cell
    s9 = [[0] * 9 for _ in range(8)]
    n9 = [[0] * 9 for _ in range(8)]
    for y in range(h):
        for x in range(w):
            r, j = y * 8 // h, x * 9 // w
            s9[r][j] += gray[y][x]
            n9[r][j] += 1
    d = 0
    for r in range(8):
        for j in range(8):
            if s9[r][j] * n9[r][j + 1] > s9[r][j + 1] * n9[r][j]:
                d |= 1 << (r * 8 + j)

    def signed(u):
        return u - (1 << 64) if u >= 1 << 63 else u

    return signed(a), signed(d)


@pytest.mark.parametrize("dims", [(13, 21, 1), (8, 8, 3), (30, 17, 2)])
def test_phash_from_pixels_matches_reference_on_ragged_dims(dims):
    """Grid cells are ragged when 8/9 don't divide the dims — the
    floor mapping and cross-multiplied comparisons must agree with an
    independent per-pixel reference."""
    from data_toolz_spark.operators.image_dedup import phash_from_pixels

    h, w, c = dims
    rng = np.random.RandomState(42 + h)
    px = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    assert phash_from_pixels(px) == _ref_phash(px)


def test_fingerprint_band_pairs_exact_by_pigeonhole(spark):
    """Banded pairs == brute-force Hamming threshold on adversarial
    fingerprints: clustered near-dups, exact dups, sign-bit values."""
    from data_toolz_spark.operators.dedup import fingerprint_band_pairs

    rng = np.random.RandomState(7)
    base = rng.randint(-(2**62), 2**62, size=12).astype(np.int64)
    fps = []
    for b in base:
        fps.append(int(b))
        # near-dup: flip up to 3 bits (stays within tau)
        x = np.uint64(b)
        for bit in rng.choice(64, size=rng.randint(0, 4), replace=False):
            x ^= np.uint64(1) << np.uint64(bit)
        fps.append(int(np.int64(x)))
    fps.append(fps[0])  # exact duplicate (hamming 0 pair)
    fps.append(-1)  # all bits set (sign-bit block extraction)
    rows = [(i, f) for i, f in enumerate(fps)]
    df = spark.createDataFrame(rows, "id long, fp long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in fingerprint_band_pairs(
            df, "id", "fp", max_hamming=3, n_blocks=8
        ).collect()
    }
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            d = bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want.add((i, j, d))
    assert got == want


def test_phash_components_parity_with_pair_closure(spark):
    """Components (distinct-fingerprint closure) == connected
    components over the pair graph — including a 6-copy identical-hash
    mega-cluster, which the components path collapses to ONE node."""
    from data_toolz_spark.operators.dedup import connected_components
    from data_toolz_spark.operators.image_dedup import (
        phash_components,
        phash_near_duplicates,
    )

    neg = -0x7FFF_0000_0000_0000  # sign bit set
    neg1 = int(np.int64(np.uint64(neg % 2**64) ^ np.uint64(1)))  # 1 bit off
    rows = (
        [(i, 0x1234_5678_9ABC_DEF0) for i in range(6)]  # mega-cluster
        + [(10, 0x1234_5678_9ABC_DEF1)]  # 1 bit off the cluster
        + [(20, neg), (21, neg1)]
        + [(30, 0x0F0F_0F0F_0F0F_0F0F)]  # singleton, far from all
    )
    df = spark.createDataFrame(rows, "media_id long, ahash long")
    pairs = phash_near_duplicates(df, max_hamming=3, n_blocks=8)
    cc = {
        (r["id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    comp = {
        (r["id"], r["component"])
        for r in phash_components(df, max_hamming=3, n_blocks=8).collect()
    }
    # contract parity with simhash_components: the map covers exactly
    # the ids that belong to some multi-member component — singletons
    # appear in neither path
    assert comp == cc
    assert 30 not in {c[0] for c in comp}


def test_image_phash_null_and_undecodable_blobs(spark):
    """Nulls and garbage bytes yield a null row with the id kept."""
    from data_toolz_spark.operators.image_dedup import (
        image_phash,
        png_neardup_table,
    )

    good = png_neardup_table(spark, 2)
    bad = spark.createDataFrame(
        [(100, None), (101, b"not a png at all")],
        good.schema,
    )
    out = image_phash(good.unionByName(bad)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {0, 1, 100, 101}
    assert by_id[100]["ahash"] is None and by_id[101]["ahash"] is None
    assert by_id[0]["ahash"] is not None


def test_planted_groups_recovered_exactly(spark):
    """End-to-end on 40 planted images (10 groups of 4): the banded
    pair set at tau=3 is exactly the within-group pairs."""
    from data_toolz_spark.operators.image_dedup import (
        image_phash,
        phash_near_duplicates,
        png_neardup_table,
    )

    hashes = image_phash(png_neardup_table(spark, 40, group_size=4))
    got = {
        (r["id_a"], r["id_b"])
        for r in phash_near_duplicates(
            hashes, max_hamming=3, n_blocks=8
        ).collect()
    }
    want = {
        (g * 4 + i, g * 4 + j)
        for g in range(10)
        for i in range(4)
        for j in range(i + 1, 4)
    }
    assert got == want
