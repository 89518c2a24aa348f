// Geometry-configurable driver for the reference decoder static sources.
//
// The upstream sample (reference: tiny_decoder/tiny_mp2v_dec.cpp:36-59)
// hard-codes a {1920, 1088, chroma=4:2:2} decoder config; conformance
// streams come in many geometries, so this driver takes width/height/
// chroma/threads on the command line and otherwise mirrors the sample:
// load the whole elementary stream, decode, write raw YUV planes (stride
// padding stripped) via the renderer callback, print wall-clock ms.
//
// Built by tools/refbuild/build.py against /root/reference/src/core/*.cpp.
//
// Usage:
//   ref_decoder -v in.m2v -o out.yuv -w 1920 -h 1088 -c 1 [-t 8] [-r reps]
//   (-o - : decode without writing, for throughput measurement;
//    -c chroma_format: 1=4:2:0 2=4:2:2 3=4:4:4, as in ISO 13818-2 6.3.5)
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "core/decoder.h"

static std::vector<uint8_t, AlignmentAllocator<uint8_t, 32>> g_buffer;

static void write_yuv(FILE* fp, frame_c* frame) {
    for (int i = 0; i < 3; i++) {
        uint8_t* plane = frame->get_planes(i);
        for (int y = 0; y < frame->get_height(i); y++, plane += frame->get_strides(i))
            fwrite(plane, 1, frame->get_width(i), fp);
    }
}

int main(int argc, char** argv) {
    const char* in_path = nullptr;
    const char* out_path = nullptr;
    int width = 1920, height = 1088, chroma = 1, threads = 0, reps = 1;
    for (int i = 1; i + 1 < argc; i += 2) {
        if (!strcmp(argv[i], "-v")) in_path = argv[i + 1];
        else if (!strcmp(argv[i], "-o")) out_path = argv[i + 1];
        else if (!strcmp(argv[i], "-w")) width = atoi(argv[i + 1]);
        else if (!strcmp(argv[i], "-h")) height = atoi(argv[i + 1]);
        else if (!strcmp(argv[i], "-c")) chroma = atoi(argv[i + 1]);
        else if (!strcmp(argv[i], "-t")) threads = atoi(argv[i + 1]);
        else if (!strcmp(argv[i], "-r")) reps = atoi(argv[i + 1]);
    }
    if (!in_path || !out_path) {
        fprintf(stderr, "usage: %s -v in.m2v -o out.yuv|- -w W -h H -c CF [-t N] [-r R]\n",
                argv[0]);
        return 2;
    }
    if (threads <= 0) {
        threads = (int)std::thread::hardware_concurrency();
        if (threads <= 0) threads = 2;
    }

    std::ifstream fp(in_path, std::ios::binary);
    if (!fp) { fprintf(stderr, "cannot open %s\n", in_path); return 2; }
    fp.seekg(0, std::ios_base::end);
    std::size_t size = (std::size_t)fp.tellg();
    fp.seekg(0, std::ios_base::beg);
    g_buffer.resize((size + 15) & ~(std::size_t)15);
    fp.read((char*)g_buffer.data(), size);
    fp.close();

    FILE* out = nullptr;
    if (strcmp(out_path, "-") != 0) {
        out = fopen(out_path, "wb");
        if (!out) { fprintf(stderr, "cannot open %s\n", out_path); return 2; }
    }

    long frames = 0;
    double best_ms = 1e30;
    for (int r = 0; r < reps; r++) {
        frames = 0;
        const auto start = std::chrono::steady_clock::now();
        {
            // pool of 10 pictures, reordering on — matches the sample's
            // benchmark defaults (tiny_mp2v_dec.cpp:48)
            mp2v_decoder_c dec({width, height, chroma, 10, threads, true},
                               [&](frame_c* frame) {
                                   frames++;
                                   if (out && r == 0) write_yuv(out, frame);
                               });
            dec.decode(g_buffer.data(), (int)g_buffer.size());
        }  // destructor joins worker + render threads (decoder.cpp:408-426)
        const auto elapsed = std::chrono::duration<double, std::milli>(
            std::chrono::steady_clock::now() - start).count();
        if (elapsed < best_ms) best_ms = elapsed;
    }
    if (out) fclose(out);
    printf("frames=%ld time_ms=%.2f fps=%.2f\n", frames, best_ms,
           frames * 1000.0 / best_ms);
    return 0;
}
