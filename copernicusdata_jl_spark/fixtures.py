"""Deterministic synthetic tables (FIXTURES.md): pages, footprints,
admin_polygons, tiles. Seeded NumPy, no wall-clock, no external data.

``pages`` mirrors BASELINE.json's input hint
``(url, warc_ts, html, text, lang)`` plus geotag columns; host ids are
Zipf-skewed so a few mega-hosts exercise skew salting. ``footprints``
mirror Sentinel granule identity (product name encodes type + sensing time
+ tile id, reference src/YAXTrees.jl:311, name slice 5:12 at :539-540).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .functions.text import expected_text, render_html

LANGS = ["en", "fr", "de", "es", "pt"]
BASE_TS = np.datetime64("2024-01-01T00:00:00")


def pages_pdf(n: int = 1000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    i = np.arange(n, dtype=np.int64)
    # Zipf-skewed host assignment over 200 hosts (alpha=1.2)
    ranks = np.arange(1, 201, dtype=np.float64)
    probs = ranks ** -1.2
    probs /= probs.sum()
    host = rng.choice(200, size=n, p=probs)
    url = np.array([f"https://host{h:04d}.example/p/{k}" for h, k in zip(host, i)])
    warc_ts = BASE_TS + (i * 137).astype("timedelta64[s]")
    # ~5% duplicated urls with later warc_ts (dedup-window test)
    ndup = n // 20
    dup_src = rng.choice(n, size=ndup, replace=False)
    # geotag: cluster center per host + jitter; ~30% coastal band
    center_lat = (host * 37 % 160) - 80 + 0.5
    center_lon = (host * 73 % 360) - 180 + 0.5
    lat = np.clip(center_lat + rng.normal(0, 2.0, n), -89.9, 89.9)
    lon = ((center_lon + rng.normal(0, 2.0, n) + 180) % 360) - 180
    coastal = rng.random(n) < 0.3
    lat = np.where(coastal, np.clip(lat * 0.2 + 10.0, -89.9, 89.9), lat)
    # antimeridian band
    anti = rng.random(n) < 0.02
    lon = np.where(anti, ((179.5 + rng.random(n)) + 180) % 360 - 180, lon)
    lang = np.array(LANGS)[i % 5]
    html = [render_html(int(k)) for k in i]
    text = [expected_text(int(k)) for k in i]
    pdf = pd.DataFrame(
        {
            "url": url,
            "warc_ts": pd.to_datetime(warc_ts),
            "html": [h.encode("utf-8") for h in html],
            "text": text,
            "lang": lang,
            "lat": lat,
            "lon": lon,
        }
    )
    dups = pdf.iloc[dup_src].copy()
    dups["warc_ts"] = dups["warc_ts"] + pd.Timedelta(days=30)
    out = pd.concat([pdf, dups], ignore_index=True)
    return out.sort_values("url", kind="stable").reset_index(drop=True)


def pages_df(spark: SparkSession, n: int = 1000, seed: int = 42, partitions: int = 8) -> DataFrame:
    return spark.createDataFrame(pages_pdf(n, seed)).repartition(partitions)


def _rect(lon0, lat0, w, h) -> np.ndarray:
    return np.array(
        [[lon0, lat0], [lon0 + w, lat0], [lon0 + w, lat0 + h], [lon0, lat0 + h]],
        dtype=np.float64,
    )


def footprints(n: int = 200, seed: int = 42) -> list[dict]:
    """Granule footprint polygons; returns list of dicts with
    product_id/product_type/sensing window/tile_id/rings."""
    rng = np.random.default_rng(seed)
    types = ["SL_2_LST", "SL_2_FRP", "OL_1_ERR"]
    out = []
    for orbit in range(n):
        tile = orbit % 120
        start = pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=101 * orbit)
        lon0 = float(((orbit * 47) % 340) - 170)
        lat0 = float(((orbit * 29) % 150) - 75)
        w = 4.0 + float(rng.random() * 8.0)
        h = 3.0 + float(rng.random() * 5.0)
        if orbit % 10 == 7:  # concave "coastal" polygon
            rings = [
                np.array(
                    [
                        [lon0, lat0],
                        [lon0 + w, lat0],
                        [lon0 + w, lat0 + 0.3 * h],
                        [lon0 + 0.3 * w, lat0 + 0.3 * h],
                        [lon0 + 0.3 * w, lat0 + 0.7 * h],
                        [lon0 + w, lat0 + 0.7 * h],
                        [lon0 + w, lat0 + h],
                        [lon0, lat0 + h],
                    ]
                )
            ]
        else:
            rings = [_rect(lon0, lat0, w, h)]
        if orbit == 13:  # antimeridian crosser
            rings = [_rect(177.0, -10.0, 6.0, 8.0)]
            rings[0][:, 0] = np.where(rings[0][:, 0] > 180.0, rings[0][:, 0] - 360.0, rings[0][:, 0])
        ptype = types[orbit % 3]
        out.append(
            {
                "product_id": f"S03{ptype.replace('_', '')[:6].upper():6s}_{start:%Y%m%dT%H%M%S}_0179_A{orbit % 1000:03d}_T{tile:03d}".replace(" ", ""),
                "product_type": ptype,
                "sensing_start": start,
                "sensing_stop": start + pd.Timedelta(minutes=3),
                "tile_id": f"T{tile:03d}",
                "rings": [r.tolist() for r in rings],
            }
        )
    return out


def admin_polygons(n: int = 50, seed: int = 42) -> list[dict]:
    rng = np.random.default_rng(seed + 1)
    out = []
    for k in range(n):
        lon0 = float(((k * 67) % 320) - 160)
        lat0 = float(((k * 41) % 140) - 70)
        w, h = 6.0 + float(rng.random() * 10), 5.0 + float(rng.random() * 8)
        if k == 7:  # multi-thousand-vertex "coast" polygon (hot boundary cell)
            t = np.linspace(0, 2 * np.pi, 2500, endpoint=False)
            rr = 5.0 + 1.5 * np.sin(9 * t) + 0.7 * np.sin(23 * t)
            ring = np.column_stack([lon0 + rr * np.cos(t), lat0 + rr * 0.7 * np.sin(t)])
            ring[:, 0] = np.clip(ring[:, 0], -179.9, 179.9)
            ring[:, 1] = np.clip(ring[:, 1], -89.9, 89.9)
            rings = [ring]
        else:
            rings = [_rect(lon0, lat0, w, h)]
        out.append(
            {
                "admin_id": f"ADM{k:04d}",
                "level": k % 3,
                "name": f"region-{k}",
                "rings": [r.tolist() for r in rings],
            }
        )
    return out


def tile_grid(z: int = 6) -> pd.DataFrame:
    """Web-mercator-style z/x/y tile grid over the full extent."""
    n = 1 << z
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    xs, ys = xs.ravel(), ys.ravel()
    lon0 = xs / n * 360.0 - 180.0
    lon1 = (xs + 1) / n * 360.0 - 180.0

    def merc_lat(yy):
        return np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * yy / n))))

    lat1 = merc_lat(ys)
    lat0 = merc_lat(ys + 1)
    return pd.DataFrame(
        {
            "tile_id": [f"Z{z}_X{x}_Y{y}" for x, y in zip(xs.tolist(), ys.tolist())],
            "x": xs,
            "y": ys,
            "z": z,
            "min_lon": lon0,
            "min_lat": lat0,
            "max_lon": lon1,
            "max_lat": lat1,
        }
    )


def planted_embeddings(
    spark: SparkSession,
    n: int = 2000,
    dim: int = 64,
    n_clusters: int = 20,
    seed: int = 7,
    sigma: float = 0.25,
    partitions: int = 8,
) -> DataFrame:
    """Seeded Gaussian-mixture embeddings with PLANTED cluster structure
    (VERDICT r4 #3): ``n_clusters`` unit-norm centers, each vector =
    ``center[vec_id % n_clusters] + sigma * N(0, I)``. Unlike the
    near-isotropic testdata embeddings (where any bucketing index's recall
    floors at its candidate fraction), true nearest neighbors here share a
    cluster, so recall meaningfully separates ANN index quality.

    Deterministic per ``vec_id`` regardless of partitioning: each row's
    noise comes from an RNG keyed by (seed, vec_id), so the fixture is
    reproducible across partition counts and cluster sizes — the same
    partition-invariance rule as the corpus samplers. Generation is
    distributed (mapInPandas over ``spark.range``); only the k×dim center
    matrix rides the closure."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            labels = (ids % n_clusters).astype(np.int32)
            vecs = []
            for i, lab in zip(ids, labels):
                noise = np.random.default_rng(seed * 1_000_003 + int(i)).normal(size=dim)
                vecs.append((centers[lab] + sigma * noise).astype(np.float32).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs, "label": labels})

    return (
        spark.range(n)
        .repartition(partitions)
        .mapInPandas(gen, "vec_id long, embedding array<float>, label int")
    )
