#!/usr/bin/env python3
"""Deterministic domain fixtures for the ingest pipeline (EP1) plus golden
outputs computed by executing the REFERENCE implementation (read-only at
/root/reference, hunspell stubbed — its branch is dead code).

Emits into src/main/resources/graft/:
  pipeline_pdf_metadata.tsv  catalog (FIXTURES.md A1)
  pipeline_pages.tsv         page images (A2)
  pipeline_det1.tsv          model-1 fake detections (A3)
  pipeline_det2.tsv          model-2 fake detections + ocr_text (A3)
  pipeline_ocr.tsv           whole-crop OCR text (A4)
  detected_goldens.tsv       golden detected_data rows (A5)
  oracle_detected.sql        DuckDB VALUES oracle for query detected_items
  oracle_det2_padded.sql     DuckDB VALUES oracle for query detections_padded
"""
import sys, types, random, json

h = types.ModuleType("hunspell")
class HunSpell:
    def __init__(self, *a): pass
    def spell(self, w): return True
    def suggest(self, w): return []
h.HunSpell = HunSpell
sys.modules["hunspell"] = h
sys.path.insert(0, "/root/reference/dags/utils")
import price_processing as pp
import correct_names as cn

OUT = "/root/repo/src/main/resources/graft"
rng = random.Random(42)

SHOPS = ["EsoMarket", "Penny", "Billa", "Albert Hypermarket", "Albert Supermarket",
         "Tesco Supermarket", "Tesco Hypermarket", "Lidl", "Kaufland", "Flop Top",
         "Flop", "Travel Free", "CBA Potraviny", "Bene", "CBA Premium", "Lidl Shop",
         "CBA Market", "Makro", "Globus", "Tamda Foods", "Ratio"]

NAME_POOL = [
    "Smetanový jogurt", "mleko polotucne", "maslo cerstve", "sýr eidam",
    "kureci prsa", "chleb tmavy", "pivo plzen", "jablka cervena",
    "cokolada horka", "jogurtbily", "m1eko plnotucne", "kurec1 stehna",
    "vejce slepici", "rohlik cerealni", "salám vysočina", "káva zrnková",
]
PRICE_POOL = ["19,90", "24 90", "129,90", "31'90", "45-", "12.7. - 14.7. 89 90",
              "1990", "49 90", "2 BAL 199 249", "€ 9,99 12,99", "75 bodu",
              "29.90 2", "1290 KC", "14'90", "17 90", "119 143,99", "89,90",
              "39,90 29,90", "15,50", "599"]
CLASSES2 = ["item_name", "item_price", "item_member_price", "item_initial_price"]

pdfs, pages, det1, det2, ocr = [], [], [], [], []
# predictions: crop_image_id -> list of model2 detection dicts (insertion order)
predictions = {}
crop_shop = {}

for shop in SHOPS:
  for flyer_no in (1, 2):
    slug = shop.lower().replace(" ", "_")
    filename = f"{slug}_flyer{flyer_no}.pdf"
    n_pages = rng.randint(1, 3)
    # varied windows relative to the EP2 sweep date 2024-10-15: past,
    # current, and future validity intervals, with flags that may disagree
    vfrom, vto = rng.choice([("2024-09-01", "2024-09-30"),
                             ("2024-10-01", "2024-10-31"),
                             ("2024-10-10", "2024-10-20"),
                             ("2024-10-16", "2024-11-05")])
    pdfs.append((filename, shop, vfrom, vto,
                 "true" if rng.random() < 0.6 else "false", n_pages))
    base = filename.rsplit(".", 1)[0]
    for p in range(1, n_pages + 1):
        page_id = f"pages/valid/{base}_page_{p}.png"
        W, H = 1240, 1754
        pages.append((page_id, filename, shop, p, W, H))
        n_det = rng.randint(1, 4)
        page_base = f"{base}_page_{p}"
        for i in range(n_det):
            x1 = rng.randint(0, W - 200); y1 = rng.randint(0, H - 200)
            x2 = x1 + rng.randint(120, min(600, W - x1))
            y2 = y1 + rng.randint(120, min(400, H - y1))
            conf = round(rng.uniform(0.5, 0.99), 4)
            det1.append((page_id, i, "shop_item", x1, y1, x2, y2, conf))
            crop_id = f"item_detected/valid/images/{page_base}_det_{i}_shop_item.png"
            cw, ch = x2 - x1, y2 - y1   # crops use the RAW box (SURVEY A3)
            crop_shop[crop_id] = shop
            predictions[crop_id] = []
            n2 = rng.randint(1, 4)
            # ensure an item_name in most crops; duplicates exercise last-wins
            classes = [rng.choice(CLASSES2) for _ in range(n2)]
            if rng.random() < 0.8:
                classes[rng.randrange(n2)] = "item_name"
            for j, cls in enumerate(classes):
                bx1 = rng.randint(0, max(0, cw - 40)); by1 = rng.randint(0, max(0, ch - 20))
                bx2 = bx1 + rng.randint(20, max(21, cw - bx1))
                by2 = by1 + rng.randint(10, max(11, ch - by1))
                c2 = round(rng.uniform(0.4, 0.99), 4)
                text = (rng.choice(NAME_POOL) if cls == "item_name"
                        else rng.choice(PRICE_POOL))
                det2.append((crop_id, j, cls, bx1, by1, bx2, by2, c2, text, cw, ch))
                predictions[crop_id].append({"class_name": cls, "ocr_text": text})
            ocr.append((crop_id, f"OCR {rng.choice(NAME_POOL)} {rng.choice(PRICE_POOL)}"))

def wtsv(name, header, rows):
    with open(f"{OUT}/{name}", "w") as f:
        f.write("\t".join(header) + "\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")

wtsv("pipeline_pdf_metadata.tsv",
     ["filename", "shop_name", "valid_from", "valid_to", "valid", "num_pages"], pdfs)
wtsv("pipeline_pages.tsv",
     ["image_id", "filename", "shop_name", "page_no", "width", "height"], pages)
wtsv("pipeline_det1.tsv",
     ["image_id", "idx", "class_name", "x1", "y1", "x2", "y2", "confidence"], det1)
wtsv("pipeline_det2.tsv",
     ["image_id", "idx", "class_name", "x1", "y1", "x2", "y2", "confidence",
      "ocr_text", "crop_width", "crop_height"], det2)
wtsv("pipeline_ocr.tsv", ["image_id", "text"], ocr)

# ---- golden: replicate data_pipeline.process_detected_items_step ----
trie = cn.Trie()
with open("/root/reference/dags/utils/item_names/unique_item_names.txt", encoding="utf-8") as f:
    for line in f:
        for w in cn.preprocess_text(line).split():
            trie.insert(w)

ocr_map = dict(ocr)

def unify(res, class_id):
    f = {"item_price": None, "initial_price": None, "member_price": None,
         "volume": None, "packaging": None, "price_ex_vat": None, "member_tag": None}
    if res is None: return f
    if isinstance(res, float):
        key = {"item_price": "item_price", "item_member_price": "member_price",
               "item_initial_price": "initial_price"}.get(class_id, "item_price")
        f[key] = res
        return f
    for k, v in res.items():
        if k == "item_price": f["item_price"] = v
        elif k == "initial_price": f["initial_price"] = v
        elif k == "item_member_price":
            if isinstance(v, str): f["member_tag"] = v
            else: f["member_price"] = v
        elif k == "item_initial_price": f["initial_price"] = v
        elif k == "volume": f["volume"] = v
        elif k == "packaging": f["packaging"] = v
        elif k == "cena bez dph": f["price_ex_vat"] = v
    return f

golden = []
for crop_id, dets in predictions.items():  # insertion order, as the reference dict
    shop = crop_shop[crop_id]
    whole = ocr_map[crop_id]
    object_name = processed_item_name = None
    raw = {"item_price": None, "item_member_price": None, "item_initial_price": None}
    proc = {"item_price": None, "item_member_price": None, "item_initial_price": None}
    for d in dets:  # loop order == idx order; later detections overwrite (last-wins)
        cls, text = d["class_name"], d["ocr_text"]
        if cls == "item_name":
            object_name = text
            processed_item_name = cn.process_single_word(text, trie)
        elif cls in raw:
            raw[cls] = text
            proc[cls] = pp.process_price_by_class_id(shop, text, cls)
    u_ip = unify(proc["item_price"], "item_price")
    u_mp = unify(proc["item_member_price"], "item_member_price")
    u_in = unify(proc["item_initial_price"], "item_initial_price")
    golden.append({
        "image_id": crop_id, "item_name": object_name,
        "processed_item_name": processed_item_name,
        "whole_image_ocr_text": whole, "shop_name": shop,
        "item_price": raw["item_price"],
        "item_member_price": raw["item_member_price"],
        "item_initial_price": raw["item_initial_price"],
        "u_ip": u_ip, "u_mp": u_mp, "u_in": u_in,
        "valid": True, "n_detections": len(dets),
    })

FIELDS = ["item_price", "initial_price", "member_price", "volume", "packaging",
          "price_ex_vat", "member_tag"]

def cell(v):
    if v is None: return "\\N"
    if isinstance(v, float): return repr(v)
    if isinstance(v, bool): return "true" if v else "false"
    return str(v)

hdr = (["image_id", "item_name", "processed_item_name", "whole_image_ocr_text",
        "shop_name", "item_price", "item_member_price", "item_initial_price",
        "valid", "n_detections"] +
       [f"ip_{f}" for f in FIELDS] + [f"mp_{f}" for f in FIELDS] +
       [f"inp_{f}" for f in FIELDS])
with open(f"{OUT}/detected_goldens.tsv", "w") as f:
    f.write("\t".join(hdr) + "\n")
    for g in golden:
        row = ([cell(g[k]) for k in hdr[:10]] +
               [cell(g["u_ip"][x]) for x in FIELDS] +
               [cell(g["u_mp"][x]) for x in FIELDS] +
               [cell(g["u_in"][x]) for x in FIELDS])
        f.write("\t".join(row) + "\n")

def sqlq(s): return "'" + str(s).replace("'", "''") + "'"
def sqlcell(v, typ):
    if v is None: return f"CAST(NULL AS {typ})"
    if typ == "DOUBLE": return f"CAST({repr(v)} AS DOUBLE)"
    if typ == "BOOLEAN": return "true" if v else "false"
    if typ == "INTEGER": return str(v)
    return sqlq(v)

rows = []
for g in golden:
    cells = [sqlcell(g["image_id"], "V"), sqlcell(g["item_name"], "VARCHAR"),
             sqlcell(g["processed_item_name"], "VARCHAR"),
             sqlcell(g["whole_image_ocr_text"], "V"), sqlcell(g["shop_name"], "V"),
             sqlcell(g["item_price"], "VARCHAR"),
             sqlcell(g["item_member_price"], "VARCHAR"),
             sqlcell(g["item_initial_price"], "VARCHAR"),
             sqlcell(g["valid"], "BOOLEAN"), sqlcell(g["n_detections"], "INTEGER")]
    for u in ["u_ip", "u_mp", "u_in"]:
        for x in FIELDS:
            typ = "VARCHAR" if x in ("volume", "packaging", "member_tag") else "DOUBLE"
            cells.append(sqlcell(g[u][x], typ))
    rows.append("(" + ", ".join(cells) + ")")
sql = ("SELECT * FROM (VALUES\n" + ",\n".join(rows) + ") AS t(" + ", ".join(hdr) +
       ")\nORDER BY image_id")
open(f"{OUT}/oracle_detected.sql", "w").write(sql)

# padded model-2 boxes, exactly the reference int() math (yolo_ocr_utils.py:115-132)
prow = []
for (crop_id, idx, cls, x1, y1, x2, y2, conf, text, cw, ch) in det2:
    pw = int((x2 - x1) * 0.10); ph = int((y2 - y1) * 0.10)
    px1 = max(0, x1 - pw); py1 = max(0, y1 - ph)
    px2 = min(cw, x2 + pw); py2 = min(ch, y2 + ph)
    prow.append(f"({sqlq(crop_id)}, {idx}, {sqlq(cls)}, {px1}, {py1}, {px2}, {py2})")
sql2 = ("SELECT * FROM (VALUES\n" + ",\n".join(prow) +
        ") AS t(image_id, idx, class_name, x1, y1, x2, y2)\nORDER BY image_id, idx")
open(f"{OUT}/oracle_det2_padded.sql", "w").write(sql2)

print(f"pdfs={len(pdfs)} pages={len(pages)} det1={len(det1)} det2={len(det2)} "
      f"crops={len(golden)}")

# ---- flattened regroup oracle: per (image, class) count + first padded box
import collections
grp = collections.OrderedDict()
for (page_id, i, cls, x1, y1, x2, y2, conf) in det1:
    # model-1 detections pad against the page dims (1240 x 1754)
    pw = int((x2 - x1) * 0.10); ph = int((y2 - y1) * 0.10)
    px1 = max(0, x1 - pw)
    grp.setdefault((page_id, cls), []).append(px1)
rows2 = []
for (page_id, cls), xs in grp.items():
    rows2.append(f"({sqlq(page_id)}, {sqlq(cls)}, {len(xs)}, {xs[0]})")
sql3 = ("SELECT * FROM (VALUES\n" + ",\n".join(rows2) +
        ") AS t(image_id, class_name, n_items, first_x1)\nORDER BY image_id, class_name")
open(f"{OUT}/oracle_regroup_flat.sql", "w").write(sql3)
print(f"regroup groups={len(rows2)}")

# ---- canonical-JSON regroup oracle: the full map<class, [detection]>
# value, entries sorted by class, serialized exactly as Spark's to_json
# (ignoreNullFields=false) renders it — compact separators, struct field
# order (bounding_box{x1,y1,x2,y2}, confidence, ocr_text), nulls
# explicit. Doubles are 4-decimal fixture values, for which Python repr
# and Java Double.toString agree on the shortest form.
jgrp = {}
for (page_id, i, cls, x1, y1, x2, y2, conf) in det1:
    W, H = 1240, 1754
    pw = int((x2 - x1) * 0.10); ph = int((y2 - y1) * 0.10)
    d = {"bounding_box": {"x1": max(0, x1 - pw), "y1": max(0, y1 - ph),
                          "x2": min(W, x2 + pw), "y2": min(H, y2 + ph)},
         "confidence": conf, "ocr_text": None}
    jgrp.setdefault(page_id, {}).setdefault(cls, []).append(d)
rows4 = []
for page_id, classes in jgrp.items():
    js = json.dumps(dict(sorted(classes.items())), separators=(",", ":"))
    rows4.append(f"({sqlq(page_id)}, {sqlq(js)})")
sql4 = ("SELECT * FROM (VALUES\n" + ",\n".join(rows4) +
        ") AS t(image_id, detections_json)\nORDER BY image_id")
open(f"{OUT}/oracle_regroup_json.sql", "w").write(sql4)
print(f"regroup json images={len(rows4)}")
