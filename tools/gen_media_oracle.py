#!/usr/bin/env python3
"""Oracle VALUES for the multimodal queries: an independent python mirror
of graft.multimodal.Multimodal's synthetic blob format (keep in sync)."""

N = 100
KINDS = ["image", "audio", "video"]
OUT = "/root/repo/src/main/resources/graft"

def payload(mid):
    plen = 64 + mid % 64
    return [(mid * 31 + i * 7) % 256 for i in range(plen)]

rows = []
for mid in range(N):
    p = payload(mid)
    width = 16 + mid % 32
    height = 16 + (mid * 3) % 32
    n_bytes = 13 + len(p)
    mean = sum(p) / len(p)
    # match Scala math.rint(mean*10000)/10000 (half-even on the same double)
    mean_r = round(mean * 10000) / 10000
    hist = [0, 0, 0, 0]
    for b in p:
        hist[b // 64] += 1
    rows.append(f"(CAST({mid} AS BIGINT), '{KINDS[mid % 3]}', {width}, {height}, {n_bytes}, "
                f"CAST({mean_r!r} AS DOUBLE), CAST({hist[0]} AS BIGINT), CAST({hist[1]} AS BIGINT), "
                f"CAST({hist[2]} AS BIGINT), CAST({hist[3]} AS BIGINT))")

sql = ("SELECT * FROM (VALUES\n" + ",\n".join(rows) +
       ") AS t(media_id, kind, width, height, n_bytes, mean_byte, h0, h1, h2, h3)"
       "\nORDER BY media_id")
open(f"{OUT}/oracle_media_features.sql", "w").write(sql)

frames = []
for mid in range(N):
    if mid % 3 != 2:  # video kind only
        continue
    p = payload(mid)
    blocks = [p[i:i + 16] for i in range(0, len(p), 16)]
    fno = 0
    for i, blk in enumerate(blocks):
        if i % 2 == 0:  # everyN = 2
            frames.append(f"(CAST({mid} AS BIGINT), {fno}, {len(blk)}, CAST({sum(blk)} AS BIGINT))")
            fno += 1

sql2 = ("SELECT * FROM (VALUES\n" + ",\n".join(frames) +
        ") AS t(media_id, frame_no, frame_bytes, byte_sum)\nORDER BY media_id, frame_no")
open(f"{OUT}/oracle_media_frames.sql", "w").write(sql2)
print(f"media rows={len(rows)} frame rows={len(frames)}")

# ---- perceptual average-hash pairs (media_phash) ----------------------
def ahash(p):
    px = [p[i % len(p)] for i in range(64)]
    mean = sum(px) // 64  # integer mean, matches the Scala int division
    h = 0
    for i, v in enumerate(px):
        if v > mean:
            h |= 1 << i
    return h

HAMMING_MAX = 8
imgs = [(mid, ahash(payload(mid))) for mid in range(N) if mid % 3 == 0]
ph = []
for i in range(len(imgs)):
    for j in range(i + 1, len(imgs)):
        d = bin(imgs[i][1] ^ imgs[j][1]).count("1")
        if d <= HAMMING_MAX:
            ph.append(f"(CAST({imgs[i][0]} AS BIGINT), CAST({imgs[j][0]} AS BIGINT), {d})")

sql3 = ("SELECT * FROM (VALUES\n" + ",\n".join(ph) +
        ") AS t(ma, mb, hamming)\nORDER BY ma, mb")
open(f"{OUT}/oracle_media_phash.sql", "w").write(sql3)
print(f"phash pairs={len(ph)}")
