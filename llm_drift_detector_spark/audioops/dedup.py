"""Audio deduplication: exact payload dup + fingerprint near-dup.

Mirrors the text strategies (``textops/dedup.py``) on the payload
column.  The reference has no audio path at all (it assumes uuid
uniqueness, ``data/collector.py:29``); these are engine additions for
the 100 TB audio tier, where re-encoded / re-gained copies of the same
recording are the dominant duplication mode and byte-hash dedup misses
them by construction.

Strategies, cheapest first:

- exact: hash-groupBy on md5(bytes) — one shuffle of ~50 B/row, the
  canonical plan.  Catches bit-identical payloads only.
- fingerprint LSH: decode scan-side -> frame the PCM into F equal
  windows -> per-window energy -> bit f = (e[f+1] > e[f]) -> split the
  bit string into B bands of F//B bits.  Clips sharing ANY exact
  (band, band_sig) are candidates.  The energy-DELTA-sign bits are
  invariant to constant gain (scaling multiplies every window energy by
  the same factor) and to time-stretch-free re-encodes (lossy
  companding perturbs energies far less than the signal envelope moves
  them), so a re-encoded or re-gained copy lands in the same buckets.
- verification: candidate pairs only — decode both payloads and gate on
  zero-lag normalized correlation (gain-invariant, unlike SNR) plus a
  length-ratio bound.

Scale shape (the part that must survive 10^12 rows):

1. Fingerprints are computed scan -> (salted repartition) -> mapInArrow;
   the payload column is consumed INSIDE the scan stage and only
   (id, band, band_sig) rows — tens of bytes — reach the bucket
   shuffle.
2. Candidate volume is bounded by bucket sizes, never the corpus;
   mega-buckets (silence, test tones — constant energy makes an
   all-zero bit string) are salted into capped sub-buckets exactly like
   the minhash path (``textops/dedup.py:112-125``), and components
   re-connect through the other bands.
3. Verification decodes ONLY candidate-pair rows: the pair list is
   broadcast against the clips table (or bucket-pruned at Iceberg
   scale), so the expensive double-decode touches ~violation-rate rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..checks.audio import _decode_np

DEFAULT_FRAMES = 129   # -> 128 delta bits
DEFAULT_BANDS = 8      # -> 16 bits/band: P(random band collision) = 2^-16


def exact_duplicates_audio(
    df: DataFrame, id_col: str = "clip_id", payload_col: str = "bytes"
) -> DataFrame:
    """(id, dup_group md5, group_size) for every bit-identical payload
    group with >= 2 members.  Same plan as the text path
    (``textops/dedup.py::exact_duplicates``): project the hash before
    the shuffle so payloads stay in the scan stage."""
    h = F.md5(F.col(payload_col)).alias("dup_group")
    w = df.select(F.col(id_col).alias("id"), h)
    counts = w.groupBy("dup_group").agg(F.count("*").alias("group_size"))
    return (
        w.join(counts.where(F.col("group_size") > 1), "dup_group")
        .select("id", "dup_group", "group_size")
    )


def _fingerprint_bits(pcm: np.ndarray, n_frames: int) -> np.ndarray | None:
    """Energy-delta sign bits for one decoded clip (None if too short).

    Mean energy per frame via ONE cumulative sum + boundary differences
    — a per-frame ``np.mean`` loop costs ~n_frames numpy-call overheads
    per clip and dominated the decode stage at 600k clips/pass (the
    frame split matches ``np.array_split``: the first ``n % n_frames``
    frames get the extra sample).
    """
    if pcm is None or len(pcm) < n_frames:
        return None
    x = pcm.astype(np.float64)
    n = len(x)
    csum = np.concatenate(([0.0], np.cumsum(x * x)))
    sizes = np.full(n_frames, n // n_frames, dtype=np.int64)
    sizes[: n % n_frames] += 1
    bounds = np.concatenate(([0], np.cumsum(sizes)))
    energies = np.diff(csum[bounds]) / sizes
    return (energies[1:] > energies[:-1]).astype(np.uint8)


_FP_SCHEMA = pa.schema(
    [("id", pa.string()), ("band", pa.int32()), ("band_sig", pa.string())]
)


def audio_fingerprints(
    clips: DataFrame,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    n_frames: int = DEFAULT_FRAMES,
    bands: int = DEFAULT_BANDS,
    salted: bool = True,
    n_partitions: int | None = None,
    salt: int = 17,
) -> DataFrame:
    """(id, band, band_sig) acoustic LSH signatures, decoded scan-side.

    ``band_sig`` is the band's bit group rendered as a hex string (so the
    output shape matches :func:`..textops.dedup.candidate_pairs` and the
    salting wrapper verbatim).  Undecodable or too-short clips emit no
    rows — dedup of broken payloads is the validator's job, not ours.
    """
    nf, nb = int(n_frames), int(bands)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("id")
            payloads = b.column("payload")
            codecs_ = b.column("codec").to_pylist()
            out_id: list[str] = []
            out_band: list[int] = []
            out_sig: list[str] = []
            for i in range(b.num_rows):
                bits = _fingerprint_bits(
                    _decode_np(payloads[i].as_py(), codecs_[i]), nf
                )
                if bits is None:
                    continue
                cid = ids[i].as_py()
                for band_idx, group in enumerate(np.array_split(bits, nb)):
                    sig = 0
                    for bit in group:
                        sig = (sig << 1) | int(bit)
                    out_id.append(cid)
                    out_band.append(band_idx)
                    out_sig.append(format(sig, "x"))
            if out_id:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_id, type=pa.string()),
                        pa.array(out_band, type=pa.int32()),
                        pa.array(out_sig, type=pa.string()),
                    ],
                    schema=_FP_SCHEMA,
                )

    src = clips.select(
        F.col(id_col).alias("id"),
        F.col(payload_col).alias("payload"),
        F.col(codec_col).alias("codec"),
    )
    if salted:
        n = int(
            n_partitions
            or clips.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        src = src.repartition(n, F.xxhash64("id", F.lit(salt)))
    return src.mapInArrow(kernel, "id string, band int, band_sig string")


def fingerprint_candidates(
    fp: DataFrame,
    max_bucket_size: int | None = 64,
    min_band_matches: int = 2,
) -> DataFrame:
    """Distinct candidate (id_a, id_b) pairs from fingerprint buckets.

    Bucket-count filter + mega-bucket salting mirror the minhash path
    (``textops/dedup.py:110-126``): oversized buckets — silence and
    constant tones collapse to one all-zero signature — are split into
    ceil(n/cap) sub-buckets by ``pmod(xxhash64(id, band), n_sub)``; the
    band participates so each band partitions the mega-bucket
    differently and components re-link through surviving pairs.

    ``min_band_matches`` is LSH AND-OR amplification: a pair must
    collide on >= this many bands.  A true re-encode/re-gain matches
    nearly all 8 bands, so recall is untouched, but a chance band
    collision must now happen TWICE — squaring the false-candidate
    probability.  This is the difference between a bounded candidate
    frame and a payload-fetch explosion on low-entropy corpora (pure
    tones: clips whose frequencies nearly coincide share band bits
    deterministically; measured at sf0.1, the 1-band OR rule produced
    a >100 GB pair shuffle while >=2 bands stays candidate-sized).
    """
    counts = fp.groupBy("band", "band_sig").agg(F.count("*").alias("n"))
    joined = fp.join(counts.where(F.col("n") > 1), ["band", "band_sig"])
    if max_bucket_size:
        n_sub = F.ceil(F.col("n") / max_bucket_size).cast("bigint")
        salted_sig = F.when(
            F.col("n") > max_bucket_size,
            F.concat_ws(
                "#",
                F.col("band_sig"),
                F.pmod(F.xxhash64("id", F.col("band")), n_sub).cast("string"),
            ),
        ).otherwise(F.col("band_sig"))
        joined = joined.withColumn("band_sig", salted_sig)
    a = joined.select("band", "band_sig", F.col("id").alias("id_a"))
    b = joined.select("band", "band_sig", F.col("id").alias("id_b"))
    # each id holds ONE sig per band, so count(*) per pair == #bands
    # on which the pair collides
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("bands_matched"))
        .where(F.col("bands_matched") >= min_band_matches)
        .select("id_a", "id_b")
    )


def _fetch_pair_payloads(
    pairs: DataFrame,
    clips: DataFrame,
    id_col: str,
    cols: dict[str, str],
    max_fetch_ids: int = 1_000,
) -> DataFrame:
    """Join each candidate pair to both members' payload columns with the
    validator's targeted-fetch discipline (``checks/audio.py:328-357``):
    small id sets collect and push as an In(clip_id, ...) literal into
    the scan (row-group pruning); larger sets fall back to an id-only
    broadcast semi-join.  ``cols`` maps output base names to clips
    columns; the result carries ``<name>_a`` / ``<name>_b`` for each.
    Shared by the whole-clip and containment verifiers so there is ONE
    fetch path to maintain."""
    ids = (
        pairs.select(F.col("id_a").alias("pid"))
        .unionAll(pairs.select(F.col("id_b").alias("pid")))
        .distinct()
    )
    proj = clips.select(
        F.col(id_col).alias("pid"),
        *[F.col(src).alias(name) for name, src in cols.items()],
    )
    id_rows = ids.limit(max_fetch_ids + 1).collect()
    if len(id_rows) <= max_fetch_ids:
        fetched = proj.where(F.col("pid").isin([r.pid for r in id_rows]))
    else:
        fetched = proj.join(F.broadcast(ids), "pid")
    side_a = fetched.select(
        F.col("pid").alias("id_a"),
        *[F.col(name).alias(f"{name}_a") for name in cols],
    )
    side_b = fetched.select(
        F.col("pid").alias("id_b"),
        *[F.col(name).alias(f"{name}_b") for name in cols],
    )
    out_cols = ["id_a", "id_b"]
    for name in cols:
        out_cols += [f"{name}_a", f"{name}_b"]
    return pairs.join(side_a, "id_a").join(side_b, "id_b").select(*out_cols)


_VERIFY_SCHEMA = (
    "id_a string, id_b string, corr double, len_ratio double"
)


def fingerprint_identical_pairs(fp: DataFrame) -> DataFrame:
    """Star pairs (group-min id, id) for clips whose FULL fingerprint —
    all bands concatenated — is identical.

    Closes the recall hole that banded candidates + mega-bucket salting
    open: the salt is ``xxhash64(id, band)``, so two IDENTICAL clips
    inside an oversized bucket co-bucket on any given band only with
    probability 1/n_sub, and with ``min_band_matches >= 2`` a specific
    pair survives only ~C(bands,2)/n_sub^2 of the time — connectivity of
    an identical-content cluster becomes probabilistic instead of
    guaranteed.  Identical-signature groups need no LSH at all: one
    groupBy to the full signature, one min-id join, and each member
    star-pairs to the group min — LINEAR in group size (never
    quadratic, even for a billion silent clips), deterministic
    single-component connectivity, and the pairs still flow through PCM
    verification like any candidate.  (Duplicates that share the same
    id — ingestion replays — are the UNIQUENESS check's domain, not
    dedup's: pairs here require ``id_a < id_b``.)
    """
    full = fp.groupBy("id").agg(
        F.concat_ws(
            "|",
            F.array_sort(
                F.collect_list(
                    F.concat_ws(":", F.col("band").cast("string"), F.col("band_sig"))
                )
            ),
        ).alias("fsig")
    )
    mins = full.groupBy("fsig").agg(
        F.min("id").alias("id_a"), F.count("*").alias("n")
    )
    return (
        full.join(mins.where(F.col("n") > 1), "fsig")
        .where(F.col("id") != F.col("id_a"))
        .select("id_a", F.col("id").alias("id_b"))
    )


def verify_pairs_pcm(
    pairs: DataFrame,
    clips: DataFrame,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    min_corr: float = 0.95,
    min_len_ratio: float = 0.98,
    max_fetch_ids: int = 1_000,
) -> DataFrame:
    """Decode candidate pairs and keep acoustic near-dups.

    Gain-invariant gate: zero-lag normalized correlation over the
    min-length prefix (SNR would reject a volume-normalized copy of the
    same recording) plus a decoded-length ratio bound.  Payload
    discipline matches the validator's targeted fetch
    (``checks/audio.py:328-357``): when the distinct candidate id set is
    small (<= ``max_fetch_ids`` = the session's parquet In-pushdown
    threshold) it is collected and pushed as an ``isin`` literal so the
    payload scan prunes to the row groups holding candidates; larger
    sets fall back to an id-only broadcast semi-join (a post-scan
    filter, but still no payload shuffle).  Either way only fetched
    candidate rows move, and they must move anyway to meet their pair
    partner.  At Iceberg scale the id list becomes a bucket-pruned scan.
    """
    both = _fetch_pair_payloads(
        pairs,
        clips,
        id_col,
        {"payload": payload_col, "codec": codec_col},
        max_fetch_ids=max_fetch_ids,
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ida = b.column("id_a")
            idb = b.column("id_b")
            pa_ = b.column("payload_a")
            pb_ = b.column("payload_b")
            ca = b.column("codec_a").to_pylist()
            cb = b.column("codec_b").to_pylist()
            rows: list[tuple[str, str, float, float]] = []
            for i in range(b.num_rows):
                x = _decode_np(pa_[i].as_py(), ca[i])
                y = _decode_np(pb_[i].as_py(), cb[i])
                if x is None or y is None or len(x) == 0 or len(y) == 0:
                    continue
                m = min(len(x), len(y))
                ratio = m / max(len(x), len(y))
                xs = x[:m].astype(np.float64)
                ys = y[:m].astype(np.float64)
                nx, ny = np.linalg.norm(xs), np.linalg.norm(ys)
                corr = float(np.dot(xs, ys) / (nx * ny)) if nx and ny else 0.0
                rows.append((ida[i].as_py(), idb[i].as_py(), corr, ratio))
            if rows:
                cols = list(zip(*rows))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(cols[0], type=pa.string()),
                        pa.array(cols[1], type=pa.string()),
                        pa.array(cols[2], type=pa.float64()),
                        pa.array(cols[3], type=pa.float64()),
                    ],
                    names=["id_a", "id_b", "corr", "len_ratio"],
                )

    scored = both.mapInArrow(kernel, _VERIFY_SCHEMA)
    return scored.where(
        (F.col("corr") >= min_corr) & (F.col("len_ratio") >= min_len_ratio)
    )


def deduplicate_audio(
    clips: DataFrame,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    **pair_kwargs,
) -> DataFrame:
    """Keep one clip per acoustic near-dup cluster (the min id — same
    keep-rule as the text path).  Everything not in any cluster passes
    through untouched.  The loser list is id-only and broadcast: a
    broadcast anti-join never shuffles the payload-carrying clips side.
    If the duplicate population outgrows broadcast size, drop the hint
    and store both sides bucketed by ``id_col`` (storage-partitioned
    join — still no payload exchange); a plain sort-merge anti-join
    would shuffle payloads and is never the right plan here."""
    from ..textops.dedup import duplicate_clusters

    pairs = audio_duplicate_pairs(
        clips,
        id_col=id_col,
        payload_col=payload_col,
        codec_col=codec_col,
        **pair_kwargs,
    )
    losers = (
        duplicate_clusters(pairs)
        .where(F.col("id") != F.col("cluster_id"))
        .select(F.col("id").alias(id_col))
    )
    return clips.join(F.broadcast(losers), id_col, "left_anti")


def audio_duplicate_pairs(
    clips: DataFrame,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    n_frames: int = DEFAULT_FRAMES,
    bands: int = DEFAULT_BANDS,
    max_bucket_size: int | None = 64,
    min_band_matches: int = 2,
    min_corr: float = 0.95,
    min_len_ratio: float = 0.98,
) -> DataFrame:
    """End-to-end acoustic near-dup pairs: fingerprint -> LSH buckets ->
    pair-restricted PCM verification.  Feed the result to
    :func:`..textops.dedup.duplicate_clusters` for keep-one-per-cluster
    dedup — the components operator is modality-agnostic."""
    # persist the signature frame: it is ~tens of bytes/clip while the
    # plan behind it decodes every payload in Python — the bucket-count
    # aggregate, the bucket join, and the pair self-join each re-evaluate
    # it otherwise (4 decode passes instead of 1)
    fp = audio_fingerprints(
        clips,
        id_col=id_col,
        payload_col=payload_col,
        codec_col=codec_col,
        n_frames=n_frames,
        bands=bands,
    ).persist()
    # persist the candidate frame as well: verify's targeted-fetch id
    # collect materializes it at plan-build time, and the returned
    # frame's joins would otherwise re-run the whole pair machinery
    # (the expensive stage on skewed corpora) at action time.
    # Banded LSH candidates UNION the identical-signature star pairs —
    # the latter restore recall for clips the salting separates.
    cands = (
        fingerprint_candidates(
            fp, max_bucket_size=max_bucket_size, min_band_matches=min_band_matches
        )
        .unionByName(fingerprint_identical_pairs(fp))
        .distinct()
        .persist()
    )
    result = verify_pairs_pcm(
        cands,
        clips,
        id_col=id_col,
        payload_col=payload_col,
        codec_col=codec_col,
        min_corr=min_corr,
        min_len_ratio=min_len_ratio,
    )
    # the verify id-collect above materialized cands; the signature frame
    # is no longer referenced by the returned plan — release it (cands
    # stays cached for the life of the returned DataFrame)
    fp.unpersist()
    return result


def audio_duplicate_pairs_checkpointed(
    spark,
    clips: DataFrame,
    checkpoint_dir: str,
    run_id: str = "default",
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    n_frames: int = DEFAULT_FRAMES,
    bands: int = DEFAULT_BANDS,
    max_bucket_size: int | None = 64,
    min_band_matches: int = 2,
    min_corr: float = 0.95,
    min_len_ratio: float = 0.98,
) -> DataFrame:
    """:func:`audio_duplicate_pairs` with DURABLE stage checkpoints.

    At 100 TB the fingerprint stage (decode every payload) is hours of
    cluster time; :func:`audio_duplicate_pairs`'s in-memory persists die
    with the driver, so a verify-stage failure replays everything.  Here
    each stage commits to parquet under
    ``<checkpoint_dir>/run=<run_id>/<stage>/`` gated on Spark's
    ``_SUCCESS`` marker (the same crash-safe discipline as
    ``pipeline/runner.py``'s metrics commit: a killed write leaves no
    marker, so resume recomputes that stage instead of trusting a
    partial one):

    1. ``fingerprints/``  (id, band, band_sig) — the decode pass;
    2. ``candidates/``    (id_a, id_b) LSH ∪ star pairs, deduped;
    3. verification runs from the stored candidates and is returned as
       a DataFrame for the caller to write (the caller's own write is
       the third commit point).

    A resumed run whose fingerprints/ committed re-runs NOTHING of the
    decode pass — stage reads come from the stored parquet, not the
    original plan.  Different geometry (n_frames/bands) or input must
    use a fresh run_id: stages key on run_id only, like the runner's
    checkpoints.
    """
    import os as _os

    from ..pipeline.runner import _path_exists

    root = f"{checkpoint_dir.rstrip('/')}/run={run_id}"

    def stage(name: str, build) -> DataFrame:
        path = f"{root}/{name}"
        if not _path_exists(spark, _os.path.join(path, "_SUCCESS")):
            build().write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    fp = stage(
        "fingerprints",
        lambda: audio_fingerprints(
            clips,
            id_col=id_col,
            payload_col=payload_col,
            codec_col=codec_col,
            n_frames=n_frames,
            bands=bands,
        ),
    )
    cands = stage(
        "candidates",
        lambda: fingerprint_candidates(
            fp, max_bucket_size=max_bucket_size, min_band_matches=min_band_matches
        )
        .unionByName(fingerprint_identical_pairs(fp))
        .distinct(),
    )
    return verify_pairs_pcm(
        cands,
        clips,
        id_col=id_col,
        payload_col=payload_col,
        codec_col=codec_col,
        min_corr=min_corr,
        min_len_ratio=min_len_ratio,
    )
