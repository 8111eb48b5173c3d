/* Full embedded detection pipeline in C: the complete yolo_forward.c
 * role (c_embedding/yolo_forward.c:965-1282) — conv engine + software
 * postprocess tail — driven entirely by the exported weight.h artifact.
 *
 * Stages (per image):
 *   1. 10-layer fixed-point conv engine (int8_engine.c, bit-exact vs
 *      the TPU engines) -> int8 head at the stride-16 grid.
 *   2. Dequantize head by 2^-sa_pred; split channels
 *      [A obj | A*C cls (anchor-major) | A*4 boxes] exactly as
 *      ops/decode.py:split_predictions.
 *   3. Anchor-grid decode: cx,cy = (sigmoid(txty)+grid)*stride,
 *      w,h = exp(twth)*anchor*stride, corners normalized to [0,1]
 *      (detector.predict semantics; reference slim_yolo_v2.py:111-143).
 *      NOTE: unlike the reference C tail, which uses anchor w for BOTH
 *      dimensions (yolo_forward.c:1043-1044 — a known defect, SURVEY §2)
 *      and a sign-flipped sigmoid (:966), this implements the correct
 *      Python semantics.
 *   4. softmax(cls)*sigmoid(obj), argmax class, confidence threshold,
 *      class-wise greedy NMS with the reference's float math
 *      (ops/nms.py:nms_greedy_numpy — areas without +1, intersection
 *      w/h floored at 1e-28, keep overlap <= thresh).
 *
 * tests/test_c_pipeline.py generates model.h around the exported
 * weight.h with the anchor table, thresholds, and expected detections
 * computed by the Python float64 tail on the (bit-identical) head, and
 * asserts this program reproduces them.
 *
 * model.h must additionally define (beyond int8_engine.c's needs):
 *   N_ANCHORS, N_CLASSES, STRIDE, CONF_THRESH, NMS_THRESH
 *   static const double anchors[N_ANCHORS*2];       (grid units, w h)
 *   static const int exp_count[IMG_B];
 *   static const double exp_boxes[], exp_scores[];  (concat, idx order)
 *   static const int exp_cls[];
 */

#include <math.h>

#define YOLO_ENGINE_NO_MAIN
#include "int8_engine.c"

typedef struct {
    double box[4];  /* x1 y1 x2 y2, normalized */
    double score;
    int cls;
} det_t;

static double sigmoid(double x) { return 1.0 / (1.0 + exp(-x)); }

/* Greedy NMS on one class's candidates (numpy-oracle order semantics:
 * ascending stable sort reversed => equal scores break toward the
 * HIGHER candidate index first). Marks keep[] in/out. */
static void nms_class(const det_t *d, const int *idx, int n, int *keep) {
    int *order = malloc(sizeof(int) * n);
    for (int i = 0; i < n; i++) order[i] = idx[i];
    /* stable insertion sort by score ascending */
    for (int i = 1; i < n; i++) {
        int v = order[i];
        int j = i - 1;
        while (j >= 0 && d[order[j]].score > d[v].score) {
            order[j + 1] = order[j];
            j--;
        }
        order[j + 1] = v;
    }
    int *alive = malloc(sizeof(int) * n);
    for (int i = 0; i < n; i++) alive[i] = 1;
    for (int oi = n - 1; oi >= 0; oi--) {   /* descending */
        if (!alive[oi]) continue;
        int i = order[oi];
        keep[i] = 1;
        const double *a = d[i].box;
        double area_a = (a[2] - a[0]) * (a[3] - a[1]);
        for (int oj = oi - 1; oj >= 0; oj--) {
            if (!alive[oj]) continue;
            const double *b = d[order[oj]].box;
            double xx1 = a[0] > b[0] ? a[0] : b[0];
            double yy1 = a[1] > b[1] ? a[1] : b[1];
            double xx2 = a[2] < b[2] ? a[2] : b[2];
            double yy2 = a[3] < b[3] ? a[3] : b[3];
            double w = xx2 - xx1, h = yy2 - yy1;
            if (w < 1e-28) w = 1e-28;
            if (h < 1e-28) h = 1e-28;
            double inter = w * h;
            double area_b = (b[2] - b[0]) * (b[3] - b[1]);
            double ovr = inter / (area_a + area_b - inter);
            if (ovr > NMS_THRESH) alive[oj] = 0;
        }
    }
    free(order);
    free(alive);
}

int main(void) {
    int gh, gw;
    int8_t *head8 = run_engine(&gh, &gw);
    const int A = N_ANCHORS, C = N_CLASSES;
    const int ch = c_out[N_LAYERS - 1];       /* A*(1+C+4) */
    const double deq = pow(2.0, -(double)scale_a[N_LAYERS]);
    const int hw = gh * gw;
    det_t *cand = malloc(sizeof(det_t) * (size_t)hw * A);

    size_t fails = 0, exp_ofs = 0;
    for (int n = 0; n < IMG_B; n++) {
        int ncand = 0;
        for (int cell = 0; cell < hw; cell++) {
            const int gy = cell / gw, gx = cell % gw;
            const int8_t *p = head8 + ((size_t)n * hw + cell) * ch;
            for (int a = 0; a < A; a++) {
                double obj = sigmoid(deq * p[a]);
                /* softmax over this anchor's class logits */
                double mx = -1e30, den = 0.0, probs_best = -1.0;
                int best = 0;
                for (int c = 0; c < C; c++) {
                    double v = deq * p[A + a * C + c];
                    if (v > mx) mx = v;
                }
                for (int c = 0; c < C; c++)
                    den += exp(deq * p[A + a * C + c] - mx);
                for (int c = 0; c < C; c++) {
                    double pr = exp(deq * p[A + a * C + c] - mx) / den
                                * obj;
                    if (pr > probs_best) { probs_best = pr; best = c; }
                }
                if (probs_best < CONF_THRESH) continue;
                const int bo = (1 + C) * A + a * 4;
                double cx = (sigmoid(deq * p[bo + 0]) + gx) * STRIDE;
                double cy = (sigmoid(deq * p[bo + 1]) + gy) * STRIDE;
                double bw = exp(deq * p[bo + 2]) * anchors[a * 2]
                            * STRIDE;
                double bh = exp(deq * p[bo + 3]) * anchors[a * 2 + 1]
                            * STRIDE;
                det_t *d = &cand[ncand++];
                double box[4] = {(cx - bw * 0.5) / IMG_W,
                                 (cy - bh * 0.5) / IMG_H,
                                 (cx + bw * 0.5) / IMG_W,
                                 (cy + bh * 0.5) / IMG_H};
                for (int k = 0; k < 4; k++)
                    d->box[k] = box[k] < 0 ? 0 : (box[k] > 1 ? 1
                                                  : box[k]);
                d->score = probs_best;
                d->cls = best;
            }
        }
        /* class-wise NMS */
        int *keep = calloc(ncand, sizeof(int));
        int *idx = malloc(sizeof(int) * (ncand ? ncand : 1));
        for (int c = 0; c < C; c++) {
            int m = 0;
            for (int i = 0; i < ncand; i++)
                if (cand[i].cls == c) idx[m++] = i;
            if (m) nms_class(cand, idx, m, keep);
        }
        /* compare against expected, in candidate-index order */
        int nk = 0;
        for (int i = 0; i < ncand; i++) nk += keep[i];
        if (nk != exp_count[n]) {
            fprintf(stderr, "img %d: %d detections, expected %d\n",
                    n, nk, exp_count[n]);
            fails++;
        } else {
            size_t e = exp_ofs;
            for (int i = 0; i < ncand; i++) {
                if (!keep[i]) continue;
                const det_t *d = &cand[i];
                int bad = d->cls != exp_cls[e];
                bad |= fabs(d->score - exp_scores[e]) > 1e-9;
                for (int k = 0; k < 4; k++)
                    bad |= fabs(d->box[k] - exp_boxes[e * 4 + k]) > 1e-6;
                if (bad) {
                    fprintf(stderr,
                            "img %d det %zu: got cls %d score %.9f "
                            "box [%f %f %f %f]\n", n, e - exp_ofs,
                            d->cls, d->score, d->box[0], d->box[1],
                            d->box[2], d->box[3]);
                    fails++;
                }
                e++;
            }
        }
        exp_ofs += exp_count[n];
        printf("img %d: %d detections (expected %d)\n",
               n, nk, exp_count[n]);
        free(keep);
        free(idx);
    }
    free(cand);
    free(head8);
    return fails ? 1 : 0;
}
