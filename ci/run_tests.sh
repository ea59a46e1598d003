#!/bin/sh
# CI entry point (ci/run-cargo-test.sh analog): CPU test suite on the
# virtual 8-device mesh + docs-registry freshness check.
set -e
cd "$(dirname "$0")/.."

echo "== lint (AST checks — the clippy/cargo-deny analog) =="
python ci/lint.py

echo "== pytest (forced-CPU, 8-device virtual mesh via tests/conftest.py) =="
python -m pytest tests/ -q

echo "== registry dump freshness (docs/elements.json vs live registry) =="
python ci/dump_registry.py /tmp/_elements_ci.json
if ! diff -q docs/elements.json /tmp/_elements_ci.json >/dev/null; then
    echo "ERROR: docs/elements.json is stale — regenerate with:"
    echo "  python ci/dump_registry.py docs/elements.json"
    diff docs/elements.json /tmp/_elements_ci.json | head -20
    exit 1
fi
echo "registry dump is fresh"

echo "== migration table freshness (docs/MIGRATION.md vs both registries) =="
cp docs/MIGRATION.md /tmp/_migration_ci.md
python ci/gen_migration.py >/dev/null
if ! diff -q /tmp/_migration_ci.md docs/MIGRATION.md >/dev/null; then
    echo "ERROR: docs/MIGRATION.md was stale — regenerated; commit the update"
    exit 1
fi
echo "migration table is fresh"

echo "== property parity (every reference property implemented) =="
python ci/prop_parity.py | tail -1
echo "CI OK"
