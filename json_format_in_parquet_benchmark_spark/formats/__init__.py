"""The four physical JSON representations (reference parity, SURVEY.md
section 1.1) plus the name->format dispatch (O18,
/root/reference/src/format/formats.rs:16-24).

| name       | representation                       | reference                |
|------------|--------------------------------------|--------------------------|
| plain_json | raw UTF-8 string column              | src/format/plain_json.rs |
| jsonb      | VariantType (parsed binary document) | src/format/jsonb.rs      |
| jsonc      | columnar tape struct (nodes/strings/ | src/format/jsonc.rs      |
|            | numbers pools)                       |                          |
| variant    | schema-shredded typed columns        | src/format/variant.rs    |

Unlike the reference (which excludes `variant` from its runnable set because
its load is unimplemented!(), src/consts.rs:3 + variant.rs:130-132), all four
formats here implement the full encode / decode / flush / load cycle.

A fifth format extends past the reference: `jsonb_shredded` keeps the
VariantType column but lets Spark 4.1's Parquet writer shred it NATIVELY
(typed_value subcolumns + binary residual per the Parquet Variant shredding
spec) -- the `variant` format's storage win without a user-declared schema.
"""

from .base import JsonFormatBase
from .plain_json import PlainJsonFormat
from .jsonb_variant import JsonbShreddedVariantFormat, JsonbVariantFormat
from .jsonc_tape import JsoncTapeFormat
from .variant_shred import VariantShredFormat

FORMATS: dict[str, type[JsonFormatBase]] = {
    "plain_json": PlainJsonFormat,
    "jsonb": JsonbVariantFormat,
    "jsonc": JsoncTapeFormat,
    "variant": VariantShredFormat,
    "jsonb_shredded": JsonbShreddedVariantFormat,
}


def get_format(name: str) -> JsonFormatBase:
    """Name -> codec instance (the reference's Format::get_format,
    src/format/formats.rs:16-24)."""
    if name not in FORMATS:
        raise KeyError(f"unknown format {name!r}; available: {sorted(FORMATS)}")
    return FORMATS[name]()


__all__ = [
    "FORMATS",
    "get_format",
    "JsonFormatBase",
    "PlainJsonFormat",
    "JsonbVariantFormat",
    "JsonbShreddedVariantFormat",
    "JsoncTapeFormat",
    "VariantShredFormat",
]
