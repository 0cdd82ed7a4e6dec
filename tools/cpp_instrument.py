"""Instrumented reference builds for parity forensics (GOLDEN.md r5).

Reproduces the three experiments that falsified round 4's heap-stale
model and pinned the parity residual:

* ``--bplog``: a build whose ``beckmann_pdf`` logs every slot
  construction (C), store (G) and read (V) to stderr when ``BPLOG=1`` —
  the log that measured the as-implemented slot distribution
  (91.4% tcache-link garbage / 8.6% zero / 1.8% previous-pdf).
* ``--zero-init``: a build whose ``beckmann_pdf`` ctor zero-initializes
  its malloc — the controlled A/B partner of our ``parity_no_stale``
  render knob (identical slot semantics on both sides).
* ``--probe``: the anisotropic unit probe (D/Lambda/Sample_wh grid) and
  the 48-case full-composition probe (generate + stored pdf + weight on
  controlled normal/direction/u inputs) that caught the raw-normal-frame
  difference (15/48 mismatches with a face-forward frame, 0/48 after
  the fix in materials.py).

Requires a prior ``python tools/cpp_baseline.py --setup`` (the decoded,
portability-patched reference tree in /tmp/refbuild). Each mode copies
that tree, applies its patch, builds, and prints the binary path; the
driving renders/comparisons are documented in GOLDEN.md.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

BUILD = "/tmp/refbuild"

BPLOG_VALUE = ('\tvirtual float value(const vec3& wo, const vec3& wi) '
               'const { \n'
               '\t\tif (getenv("BPLOG")) fprintf(stderr, "V %p %.9g\\n", '
               '(void*)distribution, *pdf_value);\n'
               '\t\treturn *pdf_value;\n\t}')

ORIG_VALUE = ('\tvirtual float value(const vec3& wo, const vec3& wi) '
              'const { \n\t\treturn *pdf_value;\n\t}')

ORIG_STORE_TAIL = '''		if (!SameHemisphere(wi, wwo))
		{
			*pdf_value = 0;
		}'''

BPLOG_STORE_TAIL = ORIG_STORE_TAIL + '''
		if (getenv("BPLOG")) fprintf(stderr, "G %p %.9g\\n", (void*)distribution, *pdf_value);'''

ORIG_CTOR = '''		pdf_value = (float*)malloc(sizeof(float));
		uvw.build_from_w(n);'''

BPLOG_CTOR = '''		pdf_value = (float*)malloc(sizeof(float));
		if (getenv("BPLOG")) fprintf(stderr, "C %p %.9g\\n", (void*)distribution, *pdf_value);
		uvw.build_from_w(n);'''

ZERO_CTOR = '''		pdf_value = (float*)malloc(sizeof(float));
		*pdf_value = 0.0f;  // A/B: kill the tcache-garbage stale read
		uvw.build_from_w(n);'''

COMPOSITION_PROBE = r'''// 48-case beckmann bounce-composition probe (GOLDEN.md r5):
// generate + stored pdf + scattering_pdf on controlled inputs.
#include "pch.h"
#include "common.h"
#include "vec3.h"
#include "onb.h"
#include "mathf.h"
#include "reflection.h"
#include "geometry.h"
#include "microfacet_distribution.h"
#include <cstdio>

int main(int argc, char** argv) {
    float rx = atof(argv[1]), ry = atof(argv[2]);
    float ax = BeckmannDistribution::RoughnessToAlpha(rx);
    float ay = BeckmannDistribution::RoughnessToAlpha(ry);
    BeckmannDistribution dist(ax, ay, true);
    float ns[4][3] = {{0,1,0},{0.70710678f,0.70710678f,0},{0.9486833f,0.31622777f,0},{0.1f,0.98f,0.17f}};
    float ds[4][3] = {{0.3f,-0.5f,0.81f},{0.9f,-0.1f,0.42f},{0.0f,-0.05f,0.999f},{-0.6f,-0.75f,0.28f}};
    float us[3][2] = {{0.3f,0.7f},{0.91f,0.13f},{0.05f,0.55f}};
    for (int a = 0; a < 4; a++) for (int b = 0; b < 4; b++) for (int c = 0; c < 3; c++) {
        vec3 n(ns[a][0], ns[a][1], ns[a][2]);
        vec3 d(ds[b][0], ds[b][1], ds[b][2]);
        d = unit_vector(d);
        onb uvw; uvw.build_from_w(n);
        vec3 wwo = unit_vector(vec3(dot(-d, uvw.u()), dot(-d, uvw.v()), dot(-d, uvw.w())));
        vec3 u(us[c][0], us[c][1], 0);
        vec3 wh = dist.Sample_wh(wwo, u);
        vec3 wi = Reflect(unit_vector(wwo), wh);
        vec3 wwi = unit_vector(wi.x() * uvw.u() + wi.y() * uvw.v() + wi.z() * uvw.w());
        float stored = dist.D(wh) * dist.G(d, wi) / (4 * AbsCosTheta(wi) * AbsCosTheta(wwo));
        if (!SameHemisphere(wi, wwo)) stored = 0;
        vec3 wo2 = unit_vector(vec3(dot(unit_vector(-d), uvw.u()), dot(unit_vector(-d), uvw.v()), dot(unit_vector(-d), uvw.w())));
        vec3 wi2 = unit_vector(vec3(dot(wwi, uvw.u()), dot(wwi, uvw.v()), dot(wwi, uvw.w())));
        vec3 wh2 = unit_vector(wi2 + wo2);
        float w = dist.Pdf(wo2, wh2) / (4 * dot(wo2, wh2));
        printf("T %d %d %d  wi %.7g %.7g %.7g  stored %.7g  w %.7g\n",
               a, b, c, wwi.x(), wwi.y(), wwi.z(), stored, w);
    }
    return 0;
}
'''


def _patch(dst: str, old: str, new: str) -> None:
    with open(dst) as f:
        s = f.read()
    assert old in s, f"pattern not found in {dst}"
    with open(dst, "w") as f:
        f.write(s.replace(old, new))


def _clone(name: str) -> str:
    d = f"/tmp/{name}"
    if os.path.exists(d):
        shutil.rmtree(d)
    shutil.copytree(BUILD, d)
    return d


def _build(d: str, out: str, src: str = "main.cpp") -> str:
    exe = os.path.join(d, out)
    subprocess.run(["g++", "-O2", "-std=c++17", "-pthread", "-I.", src,
                    "-o", exe], check=True, cwd=d)
    return exe


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bplog", action="store_true")
    ap.add_argument("--zero-init", action="store_true")
    ap.add_argument("--probe", action="store_true")
    args = ap.parse_args()
    if not os.path.exists(os.path.join(BUILD, "main.cpp")):
        sys.exit("run tools/cpp_baseline.py first (no /tmp/refbuild)")

    if args.bplog:
        d = _clone("refbplog")
        _patch(os.path.join(d, "pdf.h"), ORIG_VALUE, BPLOG_VALUE)
        _patch(os.path.join(d, "pdf.h"), ORIG_STORE_TAIL, BPLOG_STORE_TAIL)
        _patch(os.path.join(d, "pdf.h"), ORIG_CTOR, BPLOG_CTOR)
        _patch(os.path.join(d, "main.cpp"), "const int thread_count = 8;",
               "const int thread_count = 1;")
        print(_build(d, "rt_bplog"),
              " # BPLOG=1 ./rt_bplog 64 64 8 50 2 out.ppm 2> bplog.txt")
    if args.zero_init:
        d = _clone("refzeroinit")
        _patch(os.path.join(d, "pdf.h"), ORIG_CTOR, ZERO_CTOR)
        print(_build(d, "rt_zeroinit"),
              " # pairs with RenderConfig.parity_no_stale")
    if args.probe:
        d = _clone("refprobe")
        with open(os.path.join(d, "minicheck3.cpp"), "w") as f:
            f.write(COMPOSITION_PROBE)
        print(_build(d, "minicheck3", "minicheck3.cpp"),
              " # ./minicheck3 0.4545455 0.0")


if __name__ == "__main__":
    main()
