"""Deterministic synthetic image corpus — the multimodal twin of
dedup/showcase.py's ``_linified_docs``.

The parquet testdata has no image table, so the image near-dup gate
derives one deterministically from the documents ids: doc ``i`` carries a
32×32 24-bit BMP of pattern ``k = i % n_patterns`` in variant
``v = (i // n_patterns) % 3``:

- v0: the base pattern — pixel (y, x) = 40 + (x·(k+3) + y·(2k+1)) mod 156
  (grayscale, range [40, 195]);
- v1: v0 + 20 brightness (no clipping) — a re-encoded/levels-adjusted
  copy whose aHash is IDENTICAL (the hash is mean-relative);
- v2: v0 with the top-left 4×4 block forced to 255 — a local edit whose
  aHash differs by a small, pattern-dependent Hamming distance (1–10 bits
  over the 16 patterns; some v2s are near-dups at max_distance=3, some
  are not — both behaviors exercised and frozen in the oracle).

Because the payload depends only on (k, v), the 48 possible aHash values
are a FROZEN model table (``frozen_ahash_table`` — same discipline as
similarity/gate_model.py's centroids): the oracle joins ids to the frozen
fingerprints and replays blocking/Hamming/closure in SQL, while the Spark
side really encodes the BMP bytes, decodes them with the pure-numpy BMP
codec, and hashes the pixels in an Arrow kernel — a hash match proves the
whole binary round-trip.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.multimodal.codecs import ahash64, encode_bmp


def synth_image(k: int, v: int) -> np.ndarray:
    """The deterministic (32, 32, 3) uint8 pattern for (pattern k, variant
    v) — see the module docstring for the variant semantics."""
    y, x = np.mgrid[0:32, 0:32]
    base = (40 + (x * (k + 3) + y * (2 * k + 1)) % 156).astype(np.uint8)
    if v == 1:
        base = base + 20
    elif v == 2:
        base = base.copy()
        base[0:4, 0:4] = 255
    return np.repeat(base[:, :, None], 3, axis=2)


def frozen_ahash_table(n_patterns: int = 16, n_variants: int = 3):
    """[(k, v, ahash64)] for every synthetic (pattern, variant) — the
    frozen fingerprint model the oracle joins against. Pure numpy; cheap
    enough to regenerate at import (48 tiny images)."""
    return [
        (k, v, ahash64(synth_image(k, v)))
        for k in range(n_patterns)
        for v in range(n_variants)
    ]


def image_twin(
    ids: DataFrame, id_col: str, n_patterns: int = 16, n_variants: int = 3
) -> DataFrame:
    """(id, payload) — the deterministic BMP per id, encoded in an
    Arrow-batched kernel (binary column plumbing: payload bytes ride
    Arrow, never the driver)."""
    schema = f"{id_col} {dict(ids.dtypes)[id_col]}, payload binary"
    # 48 distinct payloads: encode each (k, v) once per batch, not per row.
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple[int, int], bytes] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf[id_col].astype("int64"):
                k = int(i) % n_patterns
                v = (int(i) // n_patterns) % n_variants
                if (k, v) not in cache:
                    cache[(k, v)] = encode_bmp(synth_image(k, v))
                payloads.append(cache[(k, v)])
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return ids.select(id_col).mapInPandas(kernel, schema)
