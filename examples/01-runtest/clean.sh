#!/bin/bash
cd "$(dirname "$0")" && rm -rf input output output_fig log
