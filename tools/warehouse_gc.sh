#!/bin/bash
# Warehouse retention sweep: delete at-rest table generations whose
# fixture key no longer matches any current testdata dir (the at-rest
# markers otherwise re-register orphaned generations forever).
# Usage: tools/warehouse_gc.sh [testdata_root]
set -e
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.WarehouseGC ${1:-/root/testdata}" 2>&1 |
  grep '"warehouse_gc"'
