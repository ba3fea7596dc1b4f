#!/usr/bin/env python3
"""EP2 fixtures (users table, FIXTURES.md A8) + DuckDB oracles for the
validity/notification pipeline. The oracles re-implement the README-derived
semantics independently in SQL over inline VALUES — a genuine cross-check
of the Spark implementation (no shared code)."""
import random

OUT = "/root/repo/src/main/resources/graft"
rng = random.Random(4242)
AS_OF = "DATE '2024-10-15'"

SHOPS = ["EsoMarket", "Penny", "Billa", "Albert Hypermarket", "Albert Supermarket",
         "Tesco Supermarket", "Tesco Hypermarket", "Lidl", "Kaufland", "Flop Top",
         "Flop", "Travel Free", "CBA Potraviny", "Bene", "CBA Premium", "Lidl Shop",
         "CBA Market", "Makro", "Globus", "Tamda Foods", "Ratio"]
ITEMS = ["mleko", "maslo", "jogurt", "syr", "chleb", "pivo", "kava", "vejce"]

users = []
for uid in range(1, 31):
    inc = rng.sample(SHOPS, rng.randint(1, 5))
    exc = rng.sample(SHOPS, rng.randint(0, 2))
    wants = rng.random() < 0.7
    tracked = rng.sample(ITEMS, rng.randint(0, 3))
    users.append((uid, ",".join(inc), ",".join(exc),
                  "true" if wants else "false", ",".join(tracked)))

with open(f"{OUT}/pipeline_users.tsv", "w") as f:
    f.write("user_id\tincluded_shops\texcluded_shops\twants_pdf_news\ttracked_items\n")
    for u in users:
        f.write("\t".join(str(x) for x in u) + "\n")

def sqlq(s): return "'" + str(s).replace("'", "''") + "'"

# meta VALUES from the committed pipeline_pdf_metadata.tsv
meta_rows = []
for line in open(f"{OUT}/pipeline_pdf_metadata.tsv").read().splitlines()[1:]:
    fn, shop, vf, vt, valid, _ = line.split("\t")
    meta_rows.append(f"({sqlq(fn)}, {sqlq(shop)}, DATE '{vf}', DATE '{vt}', {valid})")
META = ("meta(filename, shop_name, valid_from, valid_to, valid) AS (VALUES\n"
        + ",\n".join(meta_rows) + ")")

users_rows = [f"(CAST({u[0]} AS BIGINT), {sqlq(u[1])}, {sqlq(u[2])}, {u[3]})" for u in users]
USERS = ("users(user_id, included, excluded, wants) AS (VALUES\n"
         + ",\n".join(users_rows) + ")")

SWEEP = f"""changed AS (
  SELECT filename, shop_name, valid AS valid_old,
         ({AS_OF} BETWEEN valid_from AND valid_to) AS valid_new
  FROM meta
  WHERE ({AS_OF} BETWEEN valid_from AND valid_to) != valid)"""

open(f"{OUT}/oracle_validity_sweep.sql", "w").write(
    f"WITH {META},\n{SWEEP}\nSELECT * FROM changed ORDER BY filename, shop_name")

# crop image ids from the det1 fixture (same derivation as the reference's
# ROI naming, yolo_ocr_utils.py:179)
ids = []
for line in open(f"{OUT}/pipeline_det1.tsv").read().splitlines()[1:]:
    c = line.split("\t")
    page_base = c[0].rsplit("/", 1)[1][:-4]
    ids.append(f"({sqlq(f'item_detected/valid/images/{page_base}_det_{c[1]}_{c[2]}.png')})")
IDS = "ids(image_id) AS (VALUES\n" + ",\n".join(ids) + ")"

open(f"{OUT}/oracle_validity_propagate.sql", "w").write(f"""WITH {META},
{SWEEP},
{IDS}
SELECT i.image_id, c.valid_new AS valid
FROM ids i
JOIN changed c
  ON regexp_extract(i.image_id, 'images/(.+)_page_\\d+_det_', 1)
     = replace(c.filename, '.pdf', '')
ORDER BY i.image_id""")

open(f"{OUT}/oracle_users_by_shop.sql", "w").write(f"""WITH {USERS},
e AS (
  SELECT user_id, unnest(string_split(included, ',')) AS shop_name, excluded
  FROM users)
SELECT shop_name, user_id
FROM e
WHERE NOT list_contains(string_split(excluded, ','), shop_name)
ORDER BY shop_name, user_id""")

open(f"{OUT}/oracle_shop_valid_files.sql", "w").write(f"""WITH {META}
SELECT shop_name, string_agg(filename, ',' ORDER BY filename) AS files_csv
FROM meta
WHERE {AS_OF} BETWEEN valid_from AND valid_to
GROUP BY shop_name
ORDER BY shop_name""")

open(f"{OUT}/oracle_notifications.sql", "w").write(f"""WITH {META},
{USERS},
e AS (
  SELECT user_id, unnest(string_split(included, ',')) AS shop_name, excluded
  FROM users
  WHERE wants),
by_shop AS (
  SELECT shop_name, user_id
  FROM e
  WHERE NOT list_contains(string_split(excluded, ','), shop_name)),
valid_files AS (
  SELECT shop_name, string_agg(filename, ',' ORDER BY filename) AS files_csv
  FROM meta
  WHERE {AS_OF} BETWEEN valid_from AND valid_to
  GROUP BY shop_name)
SELECT b.user_id, b.shop_name, v.files_csv
FROM by_shop b
JOIN valid_files v USING (shop_name)
ORDER BY b.user_id, b.shop_name""")

print(f"users={len(users)} meta={len(meta_rows)} ids={len(ids)}")

# ---- per-item tracking alerts oracle (README.md ST4 "tracking items") ----
items_rows = []
for line in open(f"{OUT}/detected_goldens.tsv").read().splitlines()[1:]:
    c = line.split("\t")
    img, shop, pname = c[0], c[4], c[2]
    pv = "CAST(NULL AS VARCHAR)" if pname == "\\N" else sqlq(pname)
    items_rows.append(f"({sqlq(img)}, {sqlq(shop)}, {pv})")
ITEMS = ("items(image_id, shop_name, pname) AS (VALUES\n"
         + ",\n".join(items_rows) + ")")
USERS_T = ("users(user_id, included, excluded, tracked) AS (VALUES\n"
           + ",\n".join(f"(CAST({u[0]} AS BIGINT), {sqlq(u[1])}, {sqlq(u[2])}, {sqlq(u[4])})"
                        for u in users) + ")")
open(f"{OUT}/oracle_item_alerts.sql", "w").write(f"""WITH {USERS_T},
{ITEMS},
byshop AS (
  SELECT user_id, unnest(string_split(included, ',')) AS shop_name,
         excluded, tracked
  FROM users),
eff AS (
  SELECT user_id, shop_name, tracked FROM byshop
  WHERE NOT list_contains(string_split(excluded, ','), shop_name)),
tw AS (
  SELECT user_id, shop_name, unnest(string_split(tracked, ',')) AS word
  FROM eff WHERE tracked != ''),
iw AS (
  SELECT DISTINCT image_id, shop_name,
    unnest(string_split(pname, ' ')) AS word
  FROM items WHERE pname IS NOT NULL AND length(pname) > 0)
SELECT DISTINCT t.user_id, t.shop_name, t.word, i.image_id
FROM tw t JOIN iw i USING (shop_name, word)
ORDER BY user_id, shop_name, word, image_id""")
print("item_alerts oracle written")
