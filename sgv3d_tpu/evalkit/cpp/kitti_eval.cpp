// KITTI AP evaluation kernels (host-side native, C ABI for ctypes).
//
// Native replacements for the reference's numba/numba.cuda kernels:
//   rotated-rect IoU (polygon clipping)  — parity with
//     /root/reference/evaluators/kitti_utils/rotate_iou.py:20-338
//   camera-frame 3D overlap kernel       — parity with
//     /root/reference/evaluators/kitti_utils/eval.py:121-158
//   TP/FP/FN statistics assignment       — parity with
//     /root/reference/evaluators/kitti_utils/eval.py:161-279
//
// Build: g++ -O3 -shared -fPIC -o libkitti_eval.so kitti_eval.cpp
#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

inline float triangle_area(const float* a, const float* b, const float* c) {
  return ((a[0] - c[0]) * (b[1] - c[1]) - (a[1] - c[1]) * (b[0] - c[0])) / 2.0f;
}

float polygon_area(const float* pts, int n) {
  float v = 0.0f;
  for (int i = 0; i < n - 2; ++i) {
    v += std::fabs(triangle_area(pts, pts + 2 * i + 2, pts + 2 * i + 4));
  }
  return v;
}

void sort_vertex_in_convex_polygon(float* pts, int n) {
  if (n <= 0) return;
  float cx = 0.0f, cy = 0.0f;
  for (int i = 0; i < n; ++i) { cx += pts[2 * i]; cy += pts[2 * i + 1]; }
  cx /= n; cy /= n;
  float vs[16];
  for (int i = 0; i < n; ++i) {
    float vx = pts[2 * i] - cx, vy = pts[2 * i + 1] - cy;
    float d = std::sqrt(vx * vx + vy * vy);
    vx /= d; vy /= d;
    if (vy < 0) vx = -2.0f - vx;
    vs[i] = vx;
  }
  // insertion sort, keeping (x, y) pairs in lockstep with keys
  for (int i = 1; i < n; ++i) {
    if (vs[i - 1] > vs[i]) {
      float temp = vs[i];
      float tx = pts[2 * i], ty = pts[2 * i + 1];
      int j = i;
      while (j > 0 && vs[j - 1] > temp) {
        vs[j] = vs[j - 1];
        pts[j * 2] = pts[j * 2 - 2];
        pts[j * 2 + 1] = pts[j * 2 - 1];
        --j;
      }
      vs[j] = temp;
      pts[j * 2] = tx;
      pts[j * 2 + 1] = ty;
    }
  }
}

bool line_segment_intersection(const float* pts1, const float* pts2, int i,
                               int j, float* out) {
  const float A[2] = {pts1[2 * i], pts1[2 * i + 1]};
  const float B[2] = {pts1[2 * ((i + 1) % 4)], pts1[2 * ((i + 1) % 4) + 1]};
  const float C[2] = {pts2[2 * j], pts2[2 * j + 1]};
  const float D[2] = {pts2[2 * ((j + 1) % 4)], pts2[2 * ((j + 1) % 4) + 1]};
  const float BA0 = B[0] - A[0], BA1 = B[1] - A[1];
  const float DA0 = D[0] - A[0], CA0 = C[0] - A[0];
  const float DA1 = D[1] - A[1], CA1 = C[1] - A[1];
  const bool acd = DA1 * CA0 > CA1 * DA0;
  const bool bcd = (D[1] - B[1]) * (C[0] - B[0]) > (C[1] - B[1]) * (D[0] - B[0]);
  if (acd != bcd) {
    const bool abc = CA1 * BA0 > BA1 * CA0;
    const bool abd = DA1 * BA0 > BA1 * DA0;
    if (abc != abd) {
      const float DC0 = D[0] - C[0], DC1 = D[1] - C[1];
      const float ABBA = A[0] * B[1] - B[0] * A[1];
      const float CDDC = C[0] * D[1] - D[0] * C[1];
      const float DH = BA1 * DC0 - BA0 * DC1;
      out[0] = (ABBA * DC0 - BA0 * CDDC) / DH;
      out[1] = (ABBA * DC1 - BA1 * CDDC) / DH;
      return true;
    }
  }
  return false;
}

bool point_in_quadrilateral(float px, float py, const float* c) {
  const float ab0 = c[2] - c[0], ab1 = c[3] - c[1];
  const float ad0 = c[6] - c[0], ad1 = c[7] - c[1];
  const float ap0 = px - c[0], ap1 = py - c[1];
  const float abab = ab0 * ab0 + ab1 * ab1;
  const float abap = ab0 * ap0 + ab1 * ap1;
  const float adad = ad0 * ad0 + ad1 * ad1;
  const float adap = ad0 * ap0 + ad1 * ap1;
  return abab >= abap && abap >= 0 && adad >= adap && adap >= 0;
}

int quadrilateral_intersection(const float* pts1, const float* pts2,
                               float* int_pts) {
  int n = 0;
  for (int i = 0; i < 4; ++i) {
    if (point_in_quadrilateral(pts1[2 * i], pts1[2 * i + 1], pts2)) {
      int_pts[n * 2] = pts1[2 * i];
      int_pts[n * 2 + 1] = pts1[2 * i + 1];
      ++n;
    }
    if (point_in_quadrilateral(pts2[2 * i], pts2[2 * i + 1], pts1)) {
      int_pts[n * 2] = pts2[2 * i];
      int_pts[n * 2 + 1] = pts2[2 * i + 1];
      ++n;
    }
  }
  float tmp[2];
  for (int i = 0; i < 4; ++i) {
    for (int j = 0; j < 4; ++j) {
      if (line_segment_intersection(pts1, pts2, i, j, tmp)) {
        int_pts[n * 2] = tmp[0];
        int_pts[n * 2 + 1] = tmp[1];
        ++n;
      }
    }
  }
  return n;
}

void rbbox_to_corners(float* corners, const float* rbbox) {
  const float a_cos = std::cos(rbbox[4]), a_sin = std::sin(rbbox[4]);
  const float cx = rbbox[0], cy = rbbox[1];
  const float xd = rbbox[2], yd = rbbox[3];
  const float corners_x[4] = {-xd / 2, -xd / 2, xd / 2, xd / 2};
  const float corners_y[4] = {-yd / 2, yd / 2, yd / 2, -yd / 2};
  for (int i = 0; i < 4; ++i) {
    corners[2 * i] = a_cos * corners_x[i] + a_sin * corners_y[i] + cx;
    corners[2 * i + 1] = -a_sin * corners_x[i] + a_cos * corners_y[i] + cy;
  }
}

float rotated_inter(const float* rb1, const float* rb2) {
  float c1[8], c2[8], ip[32];
  rbbox_to_corners(c1, rb1);
  rbbox_to_corners(c2, rb2);
  int n = quadrilateral_intersection(c1, c2, ip);
  sort_vertex_in_convex_polygon(ip, n);
  return polygon_area(ip, n);
}

float rotate_iou_eval_one(const float* rb1, const float* rb2, int criterion) {
  const float area1 = rb1[2] * rb1[3];
  const float area2 = rb2[2] * rb2[3];
  const float ai = rotated_inter(rb1, rb2);
  switch (criterion) {
    case -1: return ai / (area1 + area2 - ai);
    case 0: return ai / area1;
    case 1: return ai / area2;
    default: return ai;
  }
}

// One frame's TP/FP/FN assignment (shared body; scratch provided by caller,
// no fixed-size caps). Mirrors compute_statistics_jit
// (/root/reference/evaluators/kitti_utils/eval.py:161-279).
void statistics_one(const double* overlaps, int64_t det_size, int64_t gt_size,
                    const double* gt_datas, const double* dt_datas,
                    const int64_t* ignored_gt, const int64_t* ignored_det,
                    const double* dc_bboxes, int64_t dc_num, int metric,
                    double min_overlap, double thresh, int compute_fp,
                    int compute_aos, int64_t* out_counts,
                    double* out_similarity, double* out_thresholds,
                    bool* assigned, bool* ign_thresh, double* delta) {
  const double NO_DETECTION = -10000000.0;
  for (int64_t i = 0; i < det_size; ++i) {
    assigned[i] = false;
    ign_thresh[i] = compute_fp && (dt_datas[i * 6 + 5] < thresh);
  }
  int64_t tp = 0, fp = 0, fn = 0;
  double similarity = 0.0;
  int64_t thresh_idx = 0;
  int64_t delta_idx = 0;

  for (int64_t i = 0; i < gt_size; ++i) {
    if (ignored_gt[i] == -1) continue;
    int64_t det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0.0;
    bool assigned_ignored_det = false;
    for (int64_t j = 0; j < det_size; ++j) {
      if (ignored_det[j] == -1 || assigned[j] || ign_thresh[j]) continue;
      const double overlap = overlaps[j * gt_size + i];
      const double dt_score = dt_datas[j * 6 + 5];
      if (!compute_fp && overlap > min_overlap && dt_score > valid_detection) {
        det_idx = j;
        valid_detection = dt_score;
      } else if (compute_fp && overlap > min_overlap &&
                 (overlap > max_overlap || assigned_ignored_det) &&
                 ignored_det[j] == 0) {
        max_overlap = overlap;
        det_idx = j;
        valid_detection = 1;
        assigned_ignored_det = false;
      } else if (compute_fp && overlap > min_overlap &&
                 valid_detection == NO_DETECTION && ignored_det[j] == 1) {
        det_idx = j;
        valid_detection = 1;
        assigned_ignored_det = true;
      }
    }
    if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
      ++fn;
    } else if (valid_detection != NO_DETECTION &&
               (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_detection != NO_DETECTION) {
      ++tp;
      out_thresholds[thresh_idx++] = dt_datas[det_idx * 6 + 5];
      if (compute_aos) {
        delta[delta_idx++] = gt_datas[i * 5 + 4] - dt_datas[det_idx * 6 + 4];
      }
      assigned[det_idx] = true;
    }
  }
  if (compute_fp) {
    for (int64_t i = 0; i < det_size; ++i) {
      if (!(assigned[i] || ignored_det[i] == -1 || ignored_det[i] == 1 ||
            ign_thresh[i])) {
        ++fp;
      }
    }
    int64_t nstuff = 0;
    if (metric == 0 && dc_num > 0) {
      for (int64_t i = 0; i < dc_num; ++i) {
        for (int64_t j = 0; j < det_size; ++j) {
          if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
              ign_thresh[j]) {
            continue;
          }
          double ov = 0.0;
          const double* b = dt_datas + j * 6;
          const double* q = dc_bboxes + i * 4;
          const double iw = std::min(b[2], q[2]) - std::max(b[0], q[0]);
          if (iw > 0) {
            const double ih = std::min(b[3], q[3]) - std::max(b[1], q[1]);
            if (ih > 0) {
              const double narea = (b[2] - b[0]) * (b[3] - b[1]);
              ov = iw * ih / narea;
            }
          }
          if (ov > min_overlap) {
            assigned[j] = true;
            ++nstuff;
          }
        }
      }
    }
    fp -= nstuff;
    if (compute_aos) {
      similarity = 0.0;
      if (tp > 0 || fp > 0) {
        for (int64_t i = 0; i < delta_idx; ++i) {
          similarity += (1.0 + std::cos(delta[i])) / 2.0;
        }
      } else {
        similarity = -1.0;
      }
    }
  }
  out_counts[0] = tp;
  out_counts[1] = fp;
  out_counts[2] = fn;
  out_counts[3] = thresh_idx;
  *out_similarity = similarity;
}

}  // namespace

extern "C" {

// out[n*K + k] = IoU(boxes[n], qboxes[k]); matches the reference's argument
// swap (rbox1 = query box, rbox2 = box) in rotate_iou_kernel_eval:335-337.
void rotate_iou_eval(const float* boxes, int64_t n, const float* qboxes,
                     int64_t k, int criterion, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < k; ++j) {
      out[i * k + j] =
          rotate_iou_eval_one(qboxes + j * 5, boxes + i * 5, criterion);
    }
  }
}

// Camera-frame 3D overlap: boxes (n, 7) = [x, y, z, l, h, w, ry]; rinc holds
// the BEV rotated intersection areas on entry and the 3D overlap on exit.
void d3_box_overlap_kernel(const double* boxes, int64_t n, const double* qboxes,
                           int64_t k, double* rinc, int criterion) {
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < k; ++j) {
      if (rinc[i * k + j] > 0) {
        const double iw = std::min(boxes[i * 7 + 1], qboxes[j * 7 + 1]) -
                          std::max(boxes[i * 7 + 1] - boxes[i * 7 + 4],
                                   qboxes[j * 7 + 1] - qboxes[j * 7 + 4]);
        if (iw > 0) {
          const double area1 =
              boxes[i * 7 + 3] * boxes[i * 7 + 4] * boxes[i * 7 + 5];
          const double area2 =
              qboxes[j * 7 + 3] * qboxes[j * 7 + 4] * qboxes[j * 7 + 5];
          const double inc = iw * rinc[i * k + j];
          double ua;
          switch (criterion) {
            case -1: ua = area1 + area2 - inc; break;
            case 0: ua = area1; break;
            case 1: ua = area2; break;
            default: ua = inc;
          }
          rinc[i * k + j] = inc / ua;
        } else {
          rinc[i * k + j] = 0.0;
        }
      }
    }
  }
}

// Axis-aligned image-plane overlap; criterion as in the reference (:84-112).
void image_box_overlap(const double* boxes, int64_t n, const double* qboxes,
                       int64_t k, int criterion, double* out) {
  for (int64_t kk = 0; kk < k; ++kk) {
    const double qarea = (qboxes[kk * 4 + 2] - qboxes[kk * 4 + 0]) *
                         (qboxes[kk * 4 + 3] - qboxes[kk * 4 + 1]);
    for (int64_t nn = 0; nn < n; ++nn) {
      const double iw = std::min(boxes[nn * 4 + 2], qboxes[kk * 4 + 2]) -
                        std::max(boxes[nn * 4 + 0], qboxes[kk * 4 + 0]);
      if (iw > 0) {
        const double ih = std::min(boxes[nn * 4 + 3], qboxes[kk * 4 + 3]) -
                          std::max(boxes[nn * 4 + 1], qboxes[kk * 4 + 1]);
        if (ih > 0) {
          double ua;
          const double narea = (boxes[nn * 4 + 2] - boxes[nn * 4 + 0]) *
                               (boxes[nn * 4 + 3] - boxes[nn * 4 + 1]);
          switch (criterion) {
            case -1: ua = narea + qarea - iw * ih; break;
            case 0: ua = narea; break;
            case 1: ua = qarea; break;
            default: ua = 1.0;
          }
          out[nn * k + kk] = iw * ih / ua;
        }
      }
    }
  }
}

// One frame's TP/FP/FN assignment. overlaps is (det, gt) row-major.
// gt_datas (gt, 5) = bbox + alpha ; dt_datas (det, 6) = bbox + alpha + score.
// Returns thresh_count via out_counts[3]; tp/fp/fn in out_counts[0..2];
// similarity in *out_similarity; tp-scores in out_thresholds (cap gt_size).
void compute_statistics(const double* overlaps, int64_t det_size,
                        int64_t gt_size, const double* gt_datas,
                        const double* dt_datas, const int64_t* ignored_gt,
                        const int64_t* ignored_det, const double* dc_bboxes,
                        int64_t dc_num, int metric, double min_overlap,
                        double thresh, int compute_fp, int compute_aos,
                        int64_t* out_counts, double* out_similarity,
                        double* out_thresholds) {
  std::vector<char> assigned(std::max<int64_t>(det_size, 1));
  std::vector<char> ign_thresh(std::max<int64_t>(det_size, 1));
  std::vector<double> delta(std::max<int64_t>(gt_size, 1));
  statistics_one(overlaps, det_size, gt_size, gt_datas, dt_datas, ignored_gt,
                 ignored_det, dc_bboxes, dc_num, metric, min_overlap, thresh,
                 compute_fp, compute_aos, out_counts, out_similarity,
                 out_thresholds, reinterpret_cast<bool*>(assigned.data()),
                 reinterpret_cast<bool*>(ign_thresh.data()), delta.data());
}

// Fused TP-score collection over a whole frame set: the compute_fp=false
// pass of every frame in one call. Ports the role of the per-frame loop in
// the reference's eval_class "thresholdss" gathering
// (/root/reference/evaluators/kitti_utils/eval.py:486-499).
// Frames are concatenated: overlaps_flat holds each frame's (det, gt)
// row-major block back to back; sizes give the per-frame extents.
// Returns (via *out_count) how many scores were written to out_scores
// (caller sizes it at sum(gt_sizes)).
void collect_tp_scores(const double* overlaps_flat, const int64_t* det_sizes,
                       const int64_t* gt_sizes, int64_t num_frames,
                       const double* gt_flat, const double* dt_flat,
                       const int64_t* ig_gt_flat, const int64_t* ig_dt_flat,
                       const double* dc_flat, const int64_t* dc_nums,
                       int metric, double min_overlap, double* out_scores,
                       int64_t* out_count) {
  int64_t max_det = 1, max_gt = 1;
  for (int64_t f = 0; f < num_frames; ++f) {
    max_det = std::max(max_det, det_sizes[f]);
    max_gt = std::max(max_gt, gt_sizes[f]);
  }
  std::vector<char> assigned(max_det), ign_thresh(max_det);
  std::vector<double> delta(max_gt);
  int64_t ov_off = 0, gt_off = 0, dt_off = 0, dc_off = 0, n_scores = 0;
  int64_t counts[4];
  double sim;
  for (int64_t f = 0; f < num_frames; ++f) {
    const int64_t ds = det_sizes[f], gs = gt_sizes[f];
    statistics_one(overlaps_flat + ov_off, ds, gs, gt_flat + gt_off * 5,
                   dt_flat + dt_off * 6, ig_gt_flat + gt_off,
                   ig_dt_flat + dt_off, dc_flat + dc_off * 4, dc_nums[f],
                   metric, min_overlap, 0.0, /*compute_fp=*/0,
                   /*compute_aos=*/0, counts, &sim, out_scores + n_scores,
                   reinterpret_cast<bool*>(assigned.data()),
                   reinterpret_cast<bool*>(ign_thresh.data()), delta.data());
    n_scores += counts[3];
    ov_off += ds * gs;
    gt_off += gs;
    dt_off += ds;
    dc_off += dc_nums[f];
  }
  *out_count = n_scores;
}

// Fused statistics accumulation: every (frame, threshold) pair in one call,
// porting fused_compute_statistics
// (/root/reference/evaluators/kitti_utils/eval.py:292-350) but over the whole
// frame set. pr is (num_thresh, 4) [tp, fp, fn, similarity], accumulated.
void fused_statistics(const double* overlaps_flat, const int64_t* det_sizes,
                      const int64_t* gt_sizes, int64_t num_frames,
                      const double* gt_flat, const double* dt_flat,
                      const int64_t* ig_gt_flat, const int64_t* ig_dt_flat,
                      const double* dc_flat, const int64_t* dc_nums,
                      int metric, double min_overlap,
                      const double* thresholds, int64_t num_thresh,
                      int compute_aos, double* pr) {
  int64_t max_det = 1, max_gt = 1;
  for (int64_t f = 0; f < num_frames; ++f) {
    max_det = std::max(max_det, det_sizes[f]);
    max_gt = std::max(max_gt, gt_sizes[f]);
  }
  std::vector<char> assigned(max_det), ign_thresh(max_det);
  std::vector<double> delta(max_gt), thr_buf(max_gt);
  int64_t ov_off = 0, gt_off = 0, dt_off = 0, dc_off = 0;
  int64_t counts[4];
  double sim;
  for (int64_t f = 0; f < num_frames; ++f) {
    const int64_t ds = det_sizes[f], gs = gt_sizes[f];
    for (int64_t t = 0; t < num_thresh; ++t) {
      statistics_one(overlaps_flat + ov_off, ds, gs, gt_flat + gt_off * 5,
                     dt_flat + dt_off * 6, ig_gt_flat + gt_off,
                     ig_dt_flat + dt_off, dc_flat + dc_off * 4, dc_nums[f],
                     metric, min_overlap, thresholds[t], /*compute_fp=*/1,
                     compute_aos, counts, &sim, thr_buf.data(),
                     reinterpret_cast<bool*>(assigned.data()),
                     reinterpret_cast<bool*>(ign_thresh.data()),
                     delta.data());
      pr[t * 4 + 0] += counts[0];
      pr[t * 4 + 1] += counts[1];
      pr[t * 4 + 2] += counts[2];
      if (sim != -1.0) pr[t * 4 + 3] += sim;
    }
    ov_off += ds * gs;
    gt_off += gs;
    dt_off += ds;
    dc_off += dc_nums[f];
  }
}

}  // extern "C"
