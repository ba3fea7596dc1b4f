#!/usr/bin/env python3
"""P7/J1 fixtures + oracles:
 - pipeline_payloads.tsv: per-image JSON payloads in the reference's
   inference-API shape (yolo_ocr_utils.py:100) for the from_json boundary
   demo, derived from pipeline_det2.tsv.
 - oracle_json_payloads.sql: expected flattened rows (VALUES).
 - oracle_pages_meta.sql: pages JOIN pdf_metadata (+2 orphan pages that
   must be surfaced by the anti-join side), computed in SQL over VALUES.
"""
import json, collections

OUT = "/root/repo/src/main/resources/graft"

def sqlq(s): return "'" + str(s).replace("'", "''") + "'"

# ---- JSON payloads from det2 fixture --------------------------------
by_img = collections.OrderedDict()
for line in open(f"{OUT}/pipeline_det2.tsv").read().splitlines()[1:]:
    c = line.split("\t")
    by_img.setdefault(c[0], []).append({
        "box": [int(c[3]), int(c[4]), int(c[5]), int(c[6])],
        "class": c[2], "confidence": float(c[7]), "ocr_text": c[8]})

with open(f"{OUT}/pipeline_payloads.tsv", "w") as f:
    f.write("image_id\tpayload\n")
    for img, dets in by_img.items():
        f.write(img + "\t" + json.dumps({"detections": dets},
                separators=(",", ":")) + "\n")

rows = []
for img, dets in by_img.items():
    for i, d in enumerate(dets):
        rows.append(f"({sqlq(img)}, {i}, {sqlq(d['class'])}, "
                    f"{d['box'][0]}, {d['box'][1]}, {d['box'][2]}, {d['box'][3]}, "
                    f"CAST({d['confidence']!r} AS DOUBLE), {sqlq(d['ocr_text'])})")
sql = ("SELECT * FROM (VALUES\n" + ",\n".join(rows) +
       ") AS t(image_id, det_idx, class_name, x1, y1, x2, y2, confidence, ocr_text)"
       "\nORDER BY image_id, det_idx")
open(f"{OUT}/oracle_json_payloads.sql", "w").write(sql)

# ---- pages x meta join oracle ---------------------------------------
meta_rows, page_rows = [], []
for line in open(f"{OUT}/pipeline_pdf_metadata.tsv").read().splitlines()[1:]:
    fn, shop, vf, vt, valid, _ = line.split("\t")
    meta_rows.append(f"({sqlq(fn)}, {sqlq(shop)}, {valid})")
for line in open(f"{OUT}/pipeline_pages.tsv").read().splitlines()[1:]:
    c = line.split("\t")
    page_rows.append(f"({sqlq(c[0])}, {sqlq(c[1])}, {sqlq(c[2])})")
# orphan pages with no catalog entry (must appear with joined=false)
page_rows.append(f"({sqlq('pages/valid/orphan_1.png')}, {sqlq('ghost.pdf')}, {sqlq('Lidl')})")
page_rows.append(f"({sqlq('pages/valid/orphan_2.png')}, {sqlq('phantom.pdf')}, {sqlq('NoShop')})")

open(f"{OUT}/oracle_pages_meta.sql", "w").write(f"""WITH meta(filename, shop_name, valid) AS (VALUES
{",".join(meta_rows)}),
pages(image_id, filename, shop_name) AS (VALUES
{",".join(page_rows)})
SELECT p.image_id, p.filename, p.shop_name,
  (m.filename IS NOT NULL) AS joined,
  coalesce(m.valid, false) AS valid
FROM pages p
LEFT JOIN meta m ON p.filename = m.filename AND p.shop_name = m.shop_name
ORDER BY p.image_id""")

print(f"payload imgs={len(by_img)} det rows={len(rows)} pages={len(page_rows)}")
