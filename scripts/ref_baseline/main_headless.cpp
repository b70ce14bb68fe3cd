// Headless driver for the REFERENCE renderer (/root/reference) — the
// measured-baseline harness prescribed by BASELINE.md:33-36.  Replaces the
// Qt GUI entry (reference main.cpp:18-46 + viewer.h) with a direct
// RayTracer::run(w, h) call and wall-clock timing; RayTracer::run needs
// nothing from Qt (raytracer.h:41-165).  Build via build_and_run.sh, which
// compiles the reference's own sources against the QImage shim in qtshim/.
//
// Usage: ref_headless <scene.scn> [width] [height] [out.ppm]
// Prints RENDER_SECONDS (the trace+shade loop, photon pass excluded — the
// photon pass prints its own "photon time" line from inside run()).
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "camera.h"
#include "sceneLoader.h"
#include "raytracer.h"

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s scene.scn [w] [h] [out.ppm]\n",
                     argv[0]);
        return 2;
    }
    srand(12345);  // fixed seed (reference uses time(0); timing-irrelevant)
    int w = argc > 2 ? std::atoi(argv[2]) : 512;
    int h = argc > 3 ? std::atoi(argv[3]) : 512;

    Camera camera({10, 5, 0}, {0, 0, 0});
    RayTracer raytracer(camera);
    Octree* scene = new Octree();
    loadScene(scene, raytracer, argv[1]);
    raytracer.setScene(scene);
    raytracer.start();  // _running gates the row loop (raytracer.h:98)

    // First run() performs octree build + photon pass (timed + printed by
    // the reference itself) before the pixel loop; to time the pixel loop
    // alone we time the WHOLE call and subtract the photon seconds parsed
    // by the wrapper script from the "photon time:" line.
    auto t0 = std::chrono::high_resolution_clock::now();
    raytracer.run(w, h);
    auto t1 = std::chrono::high_resolution_clock::now();
    double total = std::chrono::duration<double>(t1 - t0).count();
    std::printf("TOTAL_RUN_SECONDS %.3f\n", total);
    std::printf("THREADS %d\n", omp_get_max_threads());

    if (argc > 4) {  // sanity artifact: the rendered frame as PPM
        FILE* f = std::fopen(argv[4], "wb");
        if (f) {
            std::fprintf(f, "P6\n%d %d\n255\n", w, h);
            auto img = raytracer.getImage();
            for (int y = 0; y < h; ++y)
                for (int x = 0; x < w; ++x) {
                    auto c = img->getPixel(x, y);
                    unsigned char px[3] = {
                        (unsigned char)(255 * c.r + 0.5),
                        (unsigned char)(255 * c.g + 0.5),
                        (unsigned char)(255 * c.b + 0.5)};
                    std::fwrite(px, 1, 3, f);
                }
            std::fclose(f);
        }
    }
    return 0;
}
