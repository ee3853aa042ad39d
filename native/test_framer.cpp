#include <cstdio>
#include <cstdint>
#include <vector>
#include <random>
extern "C" {
struct Framer;
Framer* framer_create(int64_t, int64_t, int);
void framer_destroy(Framer*);
int framer_add_stream(Framer*);
int framer_feed(Framer*, int, const float*, int64_t);
int framer_finish_stream(Framer*, int);
int framer_next_batch(Framer*, float*, int*, int64_t*, int64_t*);
int framer_pending(Framer*);
}
int main() {
    std::vector<float> data(2500);
    for (size_t i = 0; i < data.size(); i++) data[i] = (float)i;
    Framer* f = framer_create(400, 40, 2);
    int sid = framer_add_stream(f);
    int64_t i = 0;
    for (int64_t step : {137, 260, 999, 1, 700, 403}) {
        framer_feed(f, sid, data.data() + i, step);
        i += step;
    }
    framer_finish_stream(f, sid);
    std::vector<float> out(2 * 440);
    int sids[2]; int64_t cids[2], valid[2];
    while (framer_pending(f)) {
        int rows = framer_next_batch(f, out.data(), sids, cids, valid);
        if (!rows) break;
        for (int r = 0; r < rows; r++)
            printf("chunk %ld len %ld first %.0f last %.0f\n",
                   cids[r], valid[r], out[r*440], out[r*440+valid[r]-1]);
    }
    framer_destroy(f);
    printf("done\n");
    return 0;
}
