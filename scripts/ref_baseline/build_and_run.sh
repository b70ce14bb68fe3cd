#!/bin/bash
# Build the REFERENCE renderer headless and measure the baseline protocol
# (BASELINE.md:33-36): cornell 512x512, FIXED 8 spp (samples 8 8), 750k
# photons — the exact workload bench.py's `rays_per_s_cornell_512_8spp`
# headline traces.  Writes /tmp/ref_baseline/{ref_headless,run.log,out.ppm}.
#
# The reference build needs Qt5 only for QImage + the GUI; this harness
# compiles the reference's own sources against the minimal QImage shim in
# qtshim/ and a headless main (main_headless.cpp) — RayTracer::run itself
# is Qt-free (reference raytracer.h:41-165).
set -euo pipefail

REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT=/tmp/ref_baseline
mkdir -p "$OUT"

# scene dir: symlink the cornell assets, swap in a fixed-8spp scn
SCN="$OUT/scene"
mkdir -p "$SCN"
for f in "$REF"/scenes/cornell/*.obj; do
    ln -sf "$f" "$SCN/$(basename "$f")"
done
# test.scn with `samples 8 32` -> `samples 8 8` (fixed spp, adaptivity off —
# the measurement protocol) — everything else (750k photons, materials,
# meshes, light) unchanged
sed 's/^samples 8 32 .*/samples 8 8 0.0015/' \
    "$REF"/scenes/cornell/test.scn > "$SCN/test_8spp.scn"

if [ ! -x "$OUT/ref_headless" ] || [ "${REBUILD:-0}" = "1" ]; then
    echo "building reference headless..." >&2
    g++ -O3 -march=native -fopenmp -std=c++14 \
        -I"$HERE/qtshim" -I"$REF/include" -I"$REF/3rd_party" \
        "$HERE/main_headless.cpp" \
        "$REF"/include/sceneLoader.cpp "$REF"/include/meshLoader.cpp \
        "$REF"/include/octree.cpp "$REF"/include/photonMap.cpp \
        "$REF"/include/util.cpp \
        -o "$OUT/ref_headless" 2> "$OUT/build.log" || {
            tail -40 "$OUT/build.log" >&2; exit 1; }
fi

THREADS=${THREADS:-$(nproc)}
echo "running cornell 512x512 / 8spp fixed / 750k photons on $THREADS threads" >&2
OMP_NUM_THREADS=$THREADS "$OUT/ref_headless" "$SCN/test_8spp.scn" \
    512 512 "$OUT/out.ppm" 2>&1 | tee "$OUT/run.log"

# summary: render seconds = total - photon pass
python3 - "$OUT/run.log" "$THREADS" <<'EOF'
import re, sys, json
log = open(sys.argv[1]).read()
photon = float(re.search(r"photon time: ([\d.]+) s", log).group(1))
total = float(re.search(r"TOTAL_RUN_SECONDS ([\d.]+)", log).group(1))
print(json.dumps({
    "ref_render_seconds": round(total - photon, 3),
    "ref_photon_seconds": round(photon, 3),
    "threads": int(sys.argv[2]),
    "protocol": "cornell 512x512, 8spp fixed, 750k photons",
}))
EOF
