#!/bin/bash
cd "$(dirname "$0")" && rm -rf input out_rk4 out_etd
