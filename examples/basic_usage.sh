#!/bin/bash
# Mirror of the reference's examples/basic_usage.sh (reference
# examples/basic_usage.sh:1-27), driven through the maw-spark CLI.
# Run from the repo root: bash examples/basic_usage.sh
set -e

# Create test data
mkdir -p test_data
echo "id,name,value" > test_data/file1.csv
echo "1,Alice,100" >> test_data/file1.csv
echo "2,Bob,200" >> test_data/file1.csv

echo "id,name,value" > test_data/file2.csv
echo "3,Charlie,300" >> test_data/file2.csv
echo "4,Diana,400" >> test_data/file2.csv

# Basic concatenation
echo "=== Basic CSV concatenation ==="
python -m streaming_parquet_spark test_data/*.csv -o output.csv

echo "=== Output ==="
cat output.csv

# Plan mode
echo "=== Plan mode ==="
python -m streaming_parquet_spark test_data/ --plan

# Cleanup
rm -rf test_data output.csv
