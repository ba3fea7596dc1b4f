#!/usr/bin/env python3
"""Golden-value generator: executes the REFERENCE implementation (read-only,
at /root/reference) on a fixed corpus and dumps JSON goldens used by the
ScalaTest specs and the DuckDB VALUES oracles. The reference's hunspell
dependency is stubbed (its branch is dead code, SURVEY §2.6 T5)."""
import sys, json, types

# stub hunspell before importing the reference module
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

PRICE_CASES = [
    # (shop, class_id, text)
    ("EsoMarket", "item_price", "129,90"),
    ("EsoMarket", "item_price", "0"),
    ("EsoMarket", "item_price", "abc"),
    ("EsoMarket", "item_price", "1990"),
    ("Penny", "item_price", "19 90 25.90 2"),
    ("Penny", "item_price", "24 90"),
    ("Penny", "item_price", "24 99"),
    ("Penny", "item_price", "12,50 15,90"),
    ("Penny", "item_price", "139"),
    ("Penny", "item_member_price", "19 90 25.90 2"),
    ("Penny", "item_price", ""),
    ("Billa", "item_price", "75 bodu"),
    ("Billa", "item_price", "za 75 BODI"),
    ("Billa", "item_price", "29.90 2"),
    ("Billa", "item_price", "29.90 39.90"),
    ("Billa", "item_price", "pri koupi 2 ks 19,90"),
    ("Billa", "item_price", "49,90"),
    ("Albert Hypermarket", "item_price", "31'90"),
    ("Albert Hypermarket", "item_price", "45-"),
    ("Albert Hypermarket", "item_price", "45:"),
    ("Albert Hypermarket", "item_price", "3"),
    ("Albert Hypermarket", "item_member_price", "89 90"),
    ("Albert Supermarket", "item_initial_price", "129,90"),
    ("Albert Supermarket", "item_price", "qq"),
    ("Tesco Supermarket", "item_price", "12.7. - 14.7. 89 90"),
    ("Tesco Supermarket", "item_price", "20 %"),
    ("Tesco Supermarket", "item_price", "S HOP 20"),
    ("Tesco Hypermarket", "item_member_price", "cena 59,90"),
    ("Tesco Hypermarket", "item_initial_price", "79,90"),
    ("Lidl", "item_price", "89,90"),
    ("Lidl", "item_price", "1990"),
    ("Lidl", "item_member_price", "49,90"),
    ("Kaufland", "item_price", "39,90 29,90"),
    ("Kaufland", "item_price", "49 90"),
    ("Kaufland", "item_price", "139,90"),
    ("Flop Top", "item_price", "19,90 24,90"),
    ("Flop", "item_price", "15,50"),
    ("Travel Free", "item_price", "€ 9,99 12,99"),
    ("Travel Free", "item_price", "12,99 € 9,99"),
    ("Travel Free", "item_price", "€ 5,49"),
    ("CBA Potraviny", "item_price", "24,90"),
    ("Bene", "item_price", "1590"),
    ("CBA Premium", "item_member_price", "34,90"),
    ("Lidl Shop", "item_price", "299"),
    ("CBA Market", "item_price", "12,30"),
    ("Makro", "item_price", "2 BAL 199 249"),
    ("Makro", "item_price", "10ks 89,90"),
    ("Makro", "item_price", "4 A VICE 129 159"),
    ("Makro", "item_price", "599"),
    ("Makro", "item_price", "BAL"),
    ("Ratio", "item_price", "119 143,99"),
    ("Ratio", "item_price", "119"),
    ("Ratio", "item_price", "119 143,99 200"),
    ("Globus", "item_price", "14'90"),
    ("Globus", "item_price", "17 90"),
    ("Globus", "item_member_price", "44'90"),
    ("Globus", "item_price", "20 %"),
    ("Globus", "item_price", "abc 14'90"),
    ("Globus", "item_initial_price", "14'90"),
    ("Globus", "item_price", "14'90 17'90"),
    ("Tamda Foods", "item_price", "1290 KC"),
    ("Tamda Foods", "item_price", "3490Kc"),
    ("Tamda Foods", "item_member_price", "5290KC"),
    ("Tamda Foods", "item_price", "20 % (akce)"),
    ("Tamda Foods", "item_initial_price", "1290 KC"),
    ("UnknownShop", "item_price", "19,90"),
    ("Lidl", "not_a_class", "19,90"),
    # parse-core edge cases through Lidl (bare parse)
    ("Lidl", "item_price", "19,90"),
    ("Lidl", "item_price", "9"),
    ("Lidl", "item_price", ""),
    ("Lidl", "item_price", "1.2.3"),
    ("Lidl", "item_price", "12."),
    ("Lidl", "item_price", "99"),
    ("Lidl", "item_price", "990"),
]

NAME_CASES = [
    "mleko", "smetanovyjogurt", "m1eko", "SMETANOVÝ JOGURT", "qqqq",
    "Florian smetanový jogurt", "jogurt", "rogurt", "maslo cerstve",
    "mas1ocerstve", "kureci prsa", "kurecíprsa", "x", "", "sýr eidam",
    "syreidam", "cokolada horka", "coko1adahorka", "chleb", "chiebtmavy",
    "pivo plzen", "p1vopizen", "a b c", "jablka cervena", "jab1kacervena",
]


# --- seeded fuzz corpus: random price-like strings through EVERY shop ---
import random as _random
_rng = _random.Random(20260812)
_frag = ["19", "90", "1990", "24,90", "31'90", "45-", "45:", "12.7.", "-",
         "14.7.", "%", "HOP", "KC", "kc", "BAL", "ks", "bodu", "bodi",
         "€", "(", ")", "akce", "cena", "A VICE", "pri koupi", "2", "0",
         ".", ",", "'", "  ", "x", "99", "139", "5290", "12,50", "*"]
_shop_list = ["EsoMarket", "Penny", "Billa", "Albert Hypermarket",
              "Tesco Supermarket", "Lidl", "Kaufland", "Flop Top",
              "Travel Free", "CBA Potraviny", "Makro", "Globus",
              "Tamda Foods", "Ratio", "Lidl Shop"]
_classes = ["item_price", "item_member_price", "item_initial_price"]
for _i in range(150):
    _shop = _rng.choice(_shop_list)
    _cid = _rng.choice(_classes)
    _text = " ".join(_rng.choice(_frag) for _ in range(_rng.randint(1, 6)))
    PRICE_CASES.append((_shop, _cid, _text))

# --- fuzz name cases: vocab concatenations with confusions/diacritics ---
_vocab_words = ["smetanovy", "jogurt", "mleko", "maslo", "cerstve", "syr",
                "eidam", "kureci", "prsa", "chleb", "tmavy", "pivo"]
_subs = {"i": "il1", "l": "il1", "r": "rj", "j": "rj", "e": "eo", "o": "eo"}
for _i in range(60):
    _ws = [_rng.choice(_vocab_words) for _ in range(_rng.randint(1, 3))]
    _t = ("" if _rng.random() < 0.5 else " ").join(_ws)
    if _rng.random() < 0.6:
        _t = "".join(_rng.choice(_subs[c]) if c in _subs and _rng.random() < 0.3
                     else c for c in _t)
    if _rng.random() < 0.2:
        _t = _t.replace("e", "é", 1)
    NAME_CASES.append(_t)

def norm_price(res):
    """Map the reference's float/dict/str union into the unified struct."""
    return res

out = {"price": [], "names": []}
for shop, cid, text in PRICE_CASES:
    r = pp.process_price_by_class_id(shop, text, cid)
    out["price"].append({"shop": shop, "class_id": cid, "text": text,
                         "result": r, "result_type": type(r).__name__})

trie = cn.Trie()
with open("/root/reference/dags/utils/item_names/unique_item_names.txt", encoding="utf-8") as f:
    for line in f:
        for w in cn.preprocess_text(line).split():
            trie.insert(w)
for t in NAME_CASES:
    out["names"].append({"text": t, "result": cn.process_single_word(t, trie)})

json.dump(out, open("/root/repo/tools/goldens.json", "w"), ensure_ascii=False, indent=1)
print("price cases:", len(out["price"]), " name cases:", len(out["names"]))

# --- TSV emission for ScalaTest + oracle VALUES ---
def unify(res, class_id):
    """reference union -> unified 7-field struct (SURVEY §1.2)."""
    f = {"item_price": None, "initial_price": None, "member_price": None,
         "volume": None, "packaging": None, "price_ex_vat": None, "member_tag": None}
    if res is None:
        return f
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

def cell(v):
    if v is None: return "\\N"
    if isinstance(v, float): return repr(v)
    return str(v)

with open("/root/repo/src/main/resources/graft/price_goldens.tsv", "w") as fh:
    fh.write("shop\tclass_id\ttext\tis_null\titem_price\tinitial_price\tmember_price\tvolume\tpackaging\tprice_ex_vat\tmember_tag\n")
    for c in out["price"]:
        u = unify(c["result"], c["class_id"])
        fh.write("\t".join([c["shop"], c["class_id"], c["text"],
            "1" if c["result"] is None else "0",
            cell(u["item_price"]), cell(u["initial_price"]), cell(u["member_price"]),
            cell(u["volume"]), cell(u["packaging"]), cell(u["price_ex_vat"]),
            cell(u["member_tag"])]) + "\n")

with open("/root/repo/src/main/resources/graft/name_goldens.tsv", "w") as fh:
    fh.write("text\texpected\n")
    for c in out["names"]:
        fh.write(c["text"] + "\t" + c["result"] + "\n")
print("TSVs written")

# --- DuckDB oracle SQL (VALUES tables of reference-produced expectations) ---
def sqlq(s):
    return "'" + s.replace("'", "''") + "'"

def sqlcell(v, typ):
    if v is None: return f"CAST(NULL AS {typ})"
    if typ == "DOUBLE": return f"CAST({repr(v)} AS DOUBLE)"
    return sqlq(str(v))

price_rows = []
for i, c in enumerate(out["price"]):
    u = unify(c["result"], c["class_id"])
    price_rows.append("(" + ", ".join([
        str(i), sqlq(c["shop"]), sqlq(c["class_id"]),
        sqlcell(u["item_price"], "DOUBLE"), sqlcell(u["initial_price"], "DOUBLE"),
        sqlcell(u["member_price"], "DOUBLE"), sqlcell(u["volume"], "VARCHAR"),
        sqlcell(u["packaging"], "VARCHAR"), sqlcell(u["price_ex_vat"], "DOUBLE"),
        sqlcell(u["member_tag"], "VARCHAR")]) + ")")
price_sql = ("SELECT * FROM (VALUES\n" + ",\n".join(price_rows) +
  ") AS t(id, shop, class_id, item_price, initial_price, member_price, volume, packaging, price_ex_vat, member_tag)\nORDER BY id")
open("/root/repo/src/main/resources/graft/oracle_price.sql", "w").write(price_sql)

name_rows = []
for i, c in enumerate(out["names"]):
    name_rows.append(f"({i}, {sqlq(c['result'])})")
name_sql = ("SELECT * FROM (VALUES\n" + ",\n".join(name_rows) +
  ") AS t(id, corrected)\nORDER BY id")
open("/root/repo/src/main/resources/graft/oracle_name.sql", "w").write(name_sql)
print("oracle SQL written")
