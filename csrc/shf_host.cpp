// Native host-side detection post-processing for smallhardface_tpu.
//
// C++ re-implementation of the capabilities the reference shipped as
// Cython/CUDA extensions (/root/reference/lib/nms/cpu_nms.pyx:17-68,
// lib/utils/bbox.pyx:16-142) plus the PyramidBox bbox_vote
// (lib/test.py:181-217). TPU inference keeps decode/top-k on device; the
// final cross-scale merge runs on host, and these kernels keep that stage
// off the Python interpreter. All arithmetic is double precision in the
// same operation order as the numpy reference implementations
// (smallhardface_tpu/ops/nms_np.py, bbox_np.py) so results match exactly.
//
// Exposed via a plain C ABI for ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Greedy NMS. dets: n rows of (x1, y1, x2, y2, score). keep: caller buffer
// of n ints. Returns number kept; kept indices in descending-score order.
int shf_nms(const double* dets, int n, double thresh, int* keep) {
  if (n <= 0) return 0;
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });
  std::vector<double> areas(n);
  for (int i = 0; i < n; ++i) {
    const double* d = dets + i * 5;
    areas[i] = (d[2] - d[0] + 1.0) * (d[3] - d[1] + 1.0);
  }
  std::vector<char> suppressed(n, 0);
  int n_keep = 0;
  for (size_t oi = 0; oi < order.size(); ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep[n_keep++] = i;
    const double* di = dets + i * 5;
    for (size_t oj = oi + 1; oj < order.size(); ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const double* dj = dets + j * 5;
      double xx1 = std::max(di[0], dj[0]);
      double yy1 = std::max(di[1], dj[1]);
      double xx2 = std::min(di[2], dj[2]);
      double yy2 = std::min(di[3], dj[3]);
      double w = std::max(0.0, xx2 - xx1 + 1.0);
      double h = std::max(0.0, yy2 - yy1 + 1.0);
      double inter = w * h;
      double iou = inter / (areas[i] + areas[j] - inter);
      if (iou > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// PyramidBox-style bbox_vote. det: n rows (x1, y1, x2, y2, score).
// out: caller buffer of n*5 doubles. Returns number of merged rows.
// Mirrors the reference control flow (lib/test.py:181-217): clusters with
// a single member are dropped unless they are the last one processed; an
// empty input yields the dummy (10, 10, 20, 20, 1e-4) row.
int shf_bbox_vote(const double* det_in, int n, double thresh, double* out) {
  if (n <= 0) {
    const double dummy[5] = {10, 10, 20, 20, 0.0001};
    std::memcpy(out, dummy, sizeof(dummy));
    return 1;
  }
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return det_in[a * 5 + 4] > det_in[b * 5 + 4];
  });
  std::vector<double> det(n * 5);
  for (int i = 0; i < n; ++i)
    std::memcpy(&det[i * 5], det_in + order[i] * 5, 5 * sizeof(double));

  int n_out = 0;
  int remaining = n;
  std::vector<double> next;
  next.reserve(n * 5);
  while (remaining > 0) {
    const double* d0 = det.data();
    double area0 = (d0[2] - d0[0] + 1.0) * (d0[3] - d0[1] + 1.0);
    next.clear();
    double wsum = 0, xs = 0, ys = 0, xe = 0, ye = 0, smax = -1;
    int n_cluster = 0;
    double first_row[5];
    for (int i = 0; i < remaining; ++i) {
      const double* di = det.data() + i * 5;
      double areai = (di[2] - di[0] + 1.0) * (di[3] - di[1] + 1.0);
      double xx1 = std::max(d0[0], di[0]);
      double yy1 = std::max(d0[1], di[1]);
      double xx2 = std::min(d0[2], di[2]);
      double yy2 = std::min(d0[3], di[3]);
      double w = std::max(0.0, xx2 - xx1 + 1.0);
      double h = std::max(0.0, yy2 - yy1 + 1.0);
      double inter = w * h;
      double iou = inter / (area0 + areai - inter);
      if (iou >= thresh) {
        double s = di[4];
        wsum += s;
        xs += di[0] * s;
        ys += di[1] * s;
        xe += di[2] * s;
        ye += di[3] * s;
        smax = std::max(smax, s);
        if (n_cluster == 0) std::memcpy(first_row, di, 5 * sizeof(double));
        ++n_cluster;
      } else {
        next.insert(next.end(), di, di + 5);
      }
    }
    int next_remaining = static_cast<int>(next.size() / 5);
    if (n_cluster <= 1) {
      if (next_remaining == 0) {
        std::memcpy(out + n_out * 5, first_row, 5 * sizeof(double));
        ++n_out;
      }
    } else {
      double* o = out + n_out * 5;
      o[0] = xs / wsum;
      o[1] = ys / wsum;
      o[2] = xe / wsum;
      o[3] = ye / wsum;
      o[4] = smax;
      ++n_out;
    }
    det.assign(next.begin(), next.end());
    remaining = next_remaining;
  }
  return n_out;
}

// IoU matrix (n × k), +1 pixel convention (bbox.pyx:16-70).
void shf_bbox_overlaps(const double* boxes, int n, const double* query,
                       int k, double* out) {
  for (int j = 0; j < k; ++j) {
    const double* q = query + j * 4;
    double qa = (q[2] - q[0] + 1.0) * (q[3] - q[1] + 1.0);
    for (int i = 0; i < n; ++i) {
      const double* b = boxes + i * 4;
      double iw = std::min(b[2], q[2]) - std::max(b[0], q[0]) + 1.0;
      double o = 0.0;
      if (iw > 0) {
        double ih = std::min(b[3], q[3]) - std::max(b[1], q[1]) + 1.0;
        if (ih > 0) {
          double ba = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0);
          double ua = ba + qa - iw * ih;
          o = iw * ih / ua;
        }
      }
      out[i * k + j] = o;
    }
  }
}

}  // extern "C"
