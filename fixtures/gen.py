"""Deterministic crawl-engine fixture generator (FIXTURES.md §1, seed=42).

Generates, under a target directory:
  corpus.parquet   — image+caption pairs, input_hint schema exactly
  urls.parquet     — url ↔ image_id (Zipf hosts + canonicalization noise)
  seeds.txt        — seed URL list (order is part of the crawl contract)
  robots.json      — per-host disallow prefixes + crawl_delay (round units)

All randomness flows from np.random.default_rng(seed) or per-image
rng(seed+i); byte-for-byte reproducible. No external data.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from web_crawler_spark.core import imagecodec, phash as ph
from web_crawler_spark.core.web import out_links

VOCAB = [f"w{i:03d}" for i in range(224)] + [
    "the", "a", "spark", "table", "row", "scan", "hash", "join", "sort",
    "merge", "batch", "window", "key", "value", "agg", "line", "part",
    "fast", "slow", "crawl", "frontier", "image", "caption", "host",
    "queue", "robot", "seed", "link", "fetch", "dedup", "near", "dup",
]


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(5, 13))
    idx = rng.integers(0, len(VOCAB), size=n)
    return " ".join(VOCAB[j] for j in idx)


def _noise_url(url: str, kind: int) -> str:
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    path = "/" + path
    if kind == 0:
        return f"{scheme}://{host.upper()}{path}"
    if kind == 1:
        return f"{scheme}://{host}:80{path}"
    if kind == 2:
        return f"{scheme}://{host}{path}#frag"
    if kind == 3:
        return f"{scheme}://{host}{path}?b=2&a=1&utm_source=x"
    if kind == 4:
        return f"{scheme}://{host}/.{path}"
    return f"{scheme}://{host}/x/..{path}"


def generate(out_dir: str, n: int = 5000, n_hosts: int = 60, seed: int = 42,
             n_seeds: int = 20) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- hosts: Zipf(1.1) so hot-domain skew is real (BASELINE.json:14)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()
    host_ids = rng.choice(n_hosts, size=n, p=probs)

    # --- images + captions with injected dups (FIXTURES.md §1.5)
    image_ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    pixels_cache: dict[int, np.ndarray] = {}
    kinds = rng.random(n)  # one draw per row decides dup class
    roll = rng.integers(0, 2**31, size=n)
    for i in range(n):
        irng = np.random.default_rng(seed + 1000 + i)
        w = int(irng.choice([32, 48, 64]))
        h = int(irng.choice([32, 48, 64]))
        kind = kinds[i]
        if i > 20 and kind < 0.02:  # exact dup of an earlier row
            j = int(roll[i] % i)
            px = pixels_cache[j]
            fmt, cap = fmts[j], captions[j]
            h, w = px.shape[0], px.shape[1]
        elif i > 20 and kind < 0.05:  # caption near-dup (1 word substituted)
            j = int(roll[i] % i)
            words = captions[j].split()
            words[int(roll[i]) % len(words)] = VOCAB[int(roll[i]) % len(VOCAB)]
            cap = " ".join(words)
            px = irng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            fmt = "raw"
        elif i > 20 and kind < 0.07:  # image near-dup: lossy re-encode of earlier
            j = int(roll[i] % i)
            src = pixels_cache[j]
            px = imagecodec.decode(imagecodec.encode(src, "q6"), src.shape[1], src.shape[0], "q6")
            h, w = px.shape[0], px.shape[1]
            fmt = "raw"
            cap = captions[j]
        elif i > 20 and kind < 0.08:  # corruption negative: PSNR < 40 vs claimed parent
            j = int(roll[i] % i)
            src = pixels_cache[j].astype(np.int64)
            noise = irng.integers(-40, 41, size=src.shape)
            px = np.clip(src + noise, 0, 255).astype(np.uint8)
            h, w = px.shape[0], px.shape[1]
            fmt = "raw"
            cap = captions[j]
        else:
            px = irng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            fmt = "q6" if irng.random() < 0.3 else "raw"
            cap = _caption(irng)
        pixels_cache[i] = px
        enc = imagecodec.encode(px, fmt)
        dec = imagecodec.decode(enc, w, h, fmt)
        image_ids.append(f"img-{i:08d}")
        blobs.append(enc)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        captions.append(cap)
        phashes.append(ph.phash(dec))

    corpus = pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array([p - (1 << 64) if p >= (1 << 63) else p for p in phashes], pa.int64()),
        }
    )
    pq.write_table(corpus, os.path.join(out_dir, "corpus.parquet"))

    # --- urls with canonicalization noise (~3%)
    urls = []
    noise_draw = rng.random(n)
    noise_kind = rng.integers(0, 6, size=n)
    seg_draw = rng.integers(0, 3, size=n)
    for i in range(n):
        segs = "/".join(f"p{(i * 31 + s) % 97}" for s in range(seg_draw[i]))
        path = f"/{segs}/img-{i:08d}" if segs else f"/img-{i:08d}"
        url = f"http://h{host_ids[i]}.example{path}"
        if noise_draw[i] < 0.03:
            url = _noise_url(url, int(noise_kind[i]))
        urls.append(url)
    pq.write_table(
        pa.table({"url": pa.array(urls, pa.string()), "image_id": pa.array(image_ids, pa.string())}),
        os.path.join(out_dir, "urls.parquet"),
    )

    # --- seeds: first URL of each distinct host until n_seeds (file order
    # fixed; n_seeds=n_hosts activates every politeness bucket from round 0)
    seen_hosts, seeds = set(), []
    for i in range(n):
        if host_ids[i] not in seen_hosts:
            seen_hosts.add(host_ids[i])
            seeds.append(urls[i])
        if len(seeds) == n_seeds:
            break
    with open(os.path.join(out_dir, "seeds.txt"), "w") as f:
        f.write("\n".join(seeds) + "\n")

    # --- robots (Disallow prefixes + Allow carve-outs, longest-match)
    robots = {}
    dis_draw = rng.random(n_hosts)
    delay_draw = rng.integers(0, 3, size=n_hosts)
    for hid in range(n_hosts):
        host = f"h{hid}.example"
        disallow, allow = [], []
        if hid == 7:
            # fully blocked EXCEPT the /p… section: the Allow carve-out
            # must out-match the catch-all Disallow (RFC 9309
            # longest-match; Allow wins ties)
            disallow, allow = ["/"], ["/p"]
        elif hid == 23:
            disallow = ["/"]
        elif dis_draw[hid] < 0.10:
            disallow = [f"/p{(hid * 13) % 97}"]
            if hid % 2 == 0:
                # carve one subtree back out of the blocked prefix
                allow = [f"/p{(hid * 13) % 97}/p"]
        robots[host] = {
            "disallow": disallow,
            "allow": allow,
            "crawl_delay": float([0.0, 1.0, 2.0][int(delay_draw[hid])]),
        }
    with open(os.path.join(out_dir, "robots.json"), "w") as f:
        json.dump(robots, f, indent=0, sort_keys=True)

    # --- sitemaps for a few hosts: depth-0 frontier feed. Each lists up
    # to 6 of the host's URLs; the first is usually also a seed (the
    # dedup path) and some land under Disallow (the gating path)
    sm_dir = os.path.join(out_dir, "sitemaps")
    os.makedirs(sm_dir, exist_ok=True)
    sitemap_hosts = []
    for hid in (1, 5, 7):
        if hid >= n_hosts:
            continue
        host = f"h{hid}.example"
        urls_h = [urls[i] for i in range(n) if host_ids[i] == hid][:6]
        if not urls_h:
            continue
        sitemap_hosts.append(host)
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "".join(f"  <url><loc>{u}</loc></url>\n" for u in urls_h)
            + "</urlset>\n"
        )
        with open(os.path.join(sm_dir, f"{host}.xml"), "w") as f:
            f.write(xml)

    # same rules as real robots.txt bodies (<host>.txt): the engine
    # parses THESE (sources/robots.py); the oracle reads the json — the
    # oracle-equivalence tests therefore also prove the parser
    txt_dir = os.path.join(out_dir, "robots_txt")
    os.makedirs(txt_dir, exist_ok=True)
    for host, rule in robots.items():
        lines = ["# synthetic robots.txt", "User-agent: *"]
        lines += [f"Disallow: {p}" for p in rule["disallow"]] or ["Disallow:"]
        lines += [f"Allow: {p}" for p in rule["allow"]]
        if rule["crawl_delay"]:
            lines.append(f"Crawl-delay: {rule['crawl_delay']:g}")
        if host in sitemap_hosts:
            lines.append(f"Sitemap: http://{host}/sitemap.xml")
        with open(os.path.join(txt_dir, f"{host}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    return {"n": n, "n_hosts": n_hosts, "seeds": len(seeds), "out_dir": out_dir,
            "links_total": sum(len(out_links(i, n)) for i in range(n))}


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures/t2"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    print(generate(out, n=n))
