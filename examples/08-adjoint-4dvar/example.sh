#!/bin/bash
# 4DVar twin experiment on the differentiable rollout; see example.py.
set -e
cd "$(dirname "$0")"
python ./example.py
