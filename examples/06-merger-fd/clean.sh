#!/bin/bash
cd "$(dirname "$0")"
rm -rf input output-fd output-spectral log-fd log-spectral
