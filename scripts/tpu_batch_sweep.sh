#!/bin/bash
set -x
cd /root/repo
echo "=== bench B=48 ==="
python bench.py 48 20
echo "=== bench B=64 ==="
python bench.py 64 20
echo DONE
