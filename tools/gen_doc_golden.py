#!/usr/bin/env python3
"""Generate the DocTemplate golden fixture by executing the REFERENCE's
own `_create_text_for_embedding` (reference/scripts/transform/
generate_embeddings.py:39-194) over branch-covering product rows.

Driver-side tooling only (pandas available here, not in the engine).
Output: src/test/resources/ref_doctemplate_golden.jsonl — one JSON object
per case with every ProductDoc field plus the expected text. The Scala
DocTemplateSpec replays each row through DocTemplate.render and asserts
exact equality.

Usage: python3 tools/gen_doc_golden.py
"""
import json
import math
import os

REF = "/root/reference/scripts/transform/generate_embeddings.py"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources",
                   "ref_doctemplate_golden.jsonl")

# -- extract and exec just the pure templating function (no model /
#    langchain / psycopg2 imports from the reference module) -------------
src = open(REF, encoding="utf-8").read()
start = src.index("def _create_text_for_embedding")
end = src.index("def _create_metadata_dict")
fn_src = src[start:end]

import pandas as pd  # noqa: E402  (driver-side only)
ns = {"pd": pd, "json": json}
exec(compile(fn_src, REF, "exec"), ns)
create_text = ns["_create_text_for_embedding"]

CATEGORY_MAP = {
    1: "Bánh ngọt", 2: "Bánh kem sinh nhật", 3: "Bánh nướng",
    4: "Bánh ngàn lớp", 5: "Bánh quy bơ", 6: "Bánh mì",
    10: "Cà phê", 11: "Trà sữa trân châu", 12: "Thức uống đá xay",
    13: "Nước ép",
}
CATEGORY_DESC = {
    1: "Các loại bánh ngọt mềm mịn", 10: "Cà phê rang xay đậm đà",
    12: "Đá xay mát lạnh mùa hè",
}

JSON_PRICE = json.dumps(
    {"product_sizes": "S|M|L", "product_prices": "30000|35000|40000"})
SQ_PRICE = "{'product_sizes': 'Nhỏ|Lớn', 'product_prices': '25000|32000'}"


def case(code, name, brand, cat_id, desc, price, disc, stars, ratings,
         orders, stock, currency=""):
    return {
        "product_code": code, "product_name": name, "product_brand": brand,
        "category_id": cat_id, "product_description": desc,
        "product_unit_price": price, "product_discount_percentage": disc,
        "product_overall_stars": stars, "product_total_ratings": ratings,
        "product_total_orders": orders, "product_stock_quantity": stock,
        "product_currency": currency,
    }


CASES = [
    # drink: coffee category triggers + JSON ladder + currency + bestseller
    case("CF-001", "Cà phê sữa đá", "Bytesme", 10, "Cà phê pha phin",
         JSON_PRICE, 15.0, 4.7, 120, 1500, 200, "VND"),
    # drink: tea trigger, single-quoted pseudo-JSON, mid-tier stars
    case("TR-001", "Trà sữa trân châu đường đen", "Bytesme", 11, "",
         SQ_PRICE, 0.0, 4.0, 30, 50, 50),
    # drink: đá xay trigger (two alternations), low stars, low stock
    case("DX-001", "Đá xay socola", "", 12, "Mát lạnh",
         JSON_PRICE, 12.5, 3.0, 5, 999, 5),
    # food: bánh ngọt trigger + long description truncation
    case("CA-001", "Bánh bông lan trứng muối", "Bytesme", 1, "x" * 1500,
         JSON_PRICE, 5.0, 4.6, 88, 1001, 101),
    # food: bánh kem trigger, boundary stars 4.5 (mid tier), orders 1000
    case("CK-001", "Bánh kem dâu tây", "brB", 2, "Ngon",
         "50000", 0.0, 4.5, 10, 1000, 100),
    # food: bánh nướng trigger, boundary stars 3.5 (low tier), stock 20
    case("BN-001", "Bánh croissant", "brC", 3, "Giòn",
         "{broken json", 20.0, 3.5, 7, 12, 20),
    # food: bánh ngàn lớp trigger, valid JSON missing keys -> NO sentence
    case("NL-001", "Bánh ngàn lớp nhân kem", "", 4, "",
         '{"foo": "bar"}', 0.0, 2.0, 0, 0, 0),
    # food: bánh quy trigger, non-string price values -> fallback sentence
    case("BQ-001", "Bánh quy bơ sữa", "brD", 5,
         "Thơm mùi bơ", '{"product_sizes": "Standard", "product_prices": 30000}',
         0.0, 1.0, 1, 1, 1),
    # food: no category snippet trigger (Bánh mì), name keyword 'bánh'
    case("BM-001", "Bánh mì que", "brE", 6, "Nóng giòn",
         "15000", 0.0, 3.9, 22, 103, 55, "đ"),
    # unknown category id: no type intro/closing, drink name keyword
    case("XX-001", "Trà đào cam sả", "brF", 99, "Thanh mát",
         "35000", 0.0, 4.8, 40, 77, 30),
    # unknown category id, no keywords in name at all
    case("XX-002", "Combo quà tặng", "", 99, "", "99000", 0.0, 3.6,
         3, 2, 150),
    # empty name/brand/desc, empty price string (falls through to Giá bán)
    case("EM-001", "", "", 13, "", "", 0.0, 0.0, 0, 0, 0),
]


def main():
    rows = []
    for c in CASES:
        cat_id = c["category_id"]
        product = dict(c)
        # the reference reads these from the product row / dim maps
        cmap = {k: v for k, v in CATEGORY_MAP.items()}
        cdesc = {k: v for k, v in CATEGORY_DESC.items()}
        text = create_text(product, cmap, cdesc)
        out = dict(c)
        out["category_name"] = CATEGORY_MAP.get(cat_id, "")
        out["category_description"] = CATEGORY_DESC.get(cat_id, "")
        out["expected_text"] = text
        rows.append(out)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(f"wrote {len(rows)} golden cases to {OUT}")


if __name__ == "__main__":
    main()
