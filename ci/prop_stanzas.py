#!/usr/bin/env python
"""Dev helper: print Prop(...) stanzas for an element's MISSING properties,
with defaults/types/ranges/mutability taken from the reference registry.

    python ci/prop_stanzas.py ELEMENT [ELEMENT...]
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CACHE = "/root/reference/docs/plugins/gst_plugins_cache.json"

TYPEMAP = {
    "gboolean": "bool", "gdouble": "float", "gfloat": "float",
    "gint": "int", "guint": "uint", "gint64": "int", "guint64": "uint64",
    "gchararray": "str", "GstCaps": "object", "GstStructure": "object",
    "GstFraction": "object", "GStrv": "object",
}

UINT_MAXES = {"4294967295", "18446744073709551615", "18446744073709551614",
              "9223372036854775807", "2147483647"}


def stanza(name, spec):
    t = spec.get("type", "gchararray")
    pytype = TYPEMAP.get(t)
    default = spec.get("default")
    extra = []
    if pytype is None:
        # enum type: default is the nick
        pytype = "enum"
        extra.append(f"# enum {t}: add choices=[...] from the ref docs")
        d = repr(default.split(" ")[0].strip('"')) if default else "None"
    elif pytype == "bool":
        d = "True" if default == "true" else "False"
    elif pytype in ("int", "uint", "uint64", "float"):
        d = default if default not in (None, "") else "0"
        if pytype == "float" and "." not in str(d) and "e" not in str(d):
            d = f"{d}.0"
        mn, mx = spec.get("min"), spec.get("max")
        if mn not in (None, "0" if pytype.startswith("u") else None, "-2147483648",
                      "-9223372036854775808"):
            extra.append(f"minimum={mn}")
        if mx not in (None,) and mx not in UINT_MAXES:
            extra.append(f"maximum={mx}")
    else:
        d = repr(default) if default not in (None, "", "NULL") else "None"
        if pytype == "object":
            d = "None"
    args = [repr(name), str(d), f'type="{pytype}"']
    args += [e for e in extra if not e.startswith("#")]
    if spec.get("mutable") == "playing":
        args.append('mutable="playing"')
    if not spec.get("writable", True):
        args.append("# read-only")
    blurb = (spec.get("blurb") or "").replace('"', "'")
    if blurb:
        args.append(f'doc="{blurb}"')
    out = f"    Prop({', '.join(args)}),"
    for e in extra:
        if e.startswith("#"):
            out += f"  {e}"
    return out


def main():
    ref = json.load(open(REF_CACHE))
    ours = json.load(open(os.path.join(REPO, "docs", "elements.json")))
    byel = {}
    for plugin in ref.values():
        byel.update(plugin.get("elements", {}))
    for el in sys.argv[1:]:
        info = byel.get(el)
        if not info:
            print(f"# {el}: not in reference cache")
            continue
        have = set()
        if el in ours:
            props = ours[el].get("properties", {})
            have = set(props) if isinstance(props, dict) else {p["name"] for p in props}
        print(f"# --- {el} ---")
        for name in sorted(info.get("properties", {})):
            if name in have or name in ("name", "parent", "async-handling",
                                        "message-forward", "qos"):
                continue
            print(stanza(name, info["properties"][name]))


if __name__ == "__main__":
    main()
