#!/bin/bash
cd "$(dirname "$0")" && rm -rf input out
