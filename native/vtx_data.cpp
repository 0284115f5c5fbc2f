// vtx_data — native data-plane for the TPU input pipeline.
//
// The reference framework decodes and crops on Python dataloader workers
// (PIL, reference factory.py:263-278).  Python threads serialize on the GIL
// around the PIL hot path; this library moves the per-image work (JPEG
// decode via libjpeg + crop + Pillow-compatible resampling) behind a C ABI
// so the host loader's thread pool scales to all cores.  Called from Python
// through ctypes (no pybind11 on this image); every entry releases the GIL
// for its whole duration by construction (pure C, no Python API).
//
// Resampling reproduces Pillow's fixed-point convolution resampler
// (ImagingResampleHorizontal/_8bpc): support-scaled bicubic (a = -0.5) /
// bilinear kernels, coefficients quantized to int with PRECISION_BITS = 22,
// accumulation in int32 with rounding — so native-decoded batches are
// pixel-compatible with the PIL fallback path.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow's PRECISION_BITS

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
    auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

// ---------------------------------------------------------------------------
// filters (Pillow: Resample.cpp bicubic_filter / bilinear_filter)
// ---------------------------------------------------------------------------

double bicubic_filter(double x) {
    constexpr double a = -0.5;
    if (x < 0.0) x = -x;
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

double bilinear_filter(double x) {
    if (x < 0.0) x = -x;
    if (x < 1.0) return 1.0 - x;
    return 0.0;
}

struct Filter {
    double (*fn)(double);
    double support;
};

Filter get_filter(int id) {
    if (id == 1) return {bilinear_filter, 1.0};
    return {bicubic_filter, 2.0};  // default bicubic
}

// Pillow precompute_coeffs: returns per-output-pixel (xmin, size) bounds and
// fixed-point coefficients.
int precompute_coeffs(int in_size, double in0, double in1, int out_size,
                      const Filter& f, std::vector<int>& bounds,
                      std::vector<int>& kk_fixed) {
    double scale = (in1 - in0) / out_size;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = f.support * filterscale;
    int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

    std::vector<double> kk(static_cast<size_t>(out_size) * ksize);
    bounds.resize(static_cast<size_t>(out_size) * 2);

    for (int xx = 0; xx < out_size; ++xx) {
        double center = in0 + (xx + 0.5) * scale;
        double ww = 0.0;
        double ss = 1.0 / filterscale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        double* k = &kk[static_cast<size_t>(xx) * ksize];
        int x = 0;
        for (; x < xmax; ++x) {
            double w = f.fn((x + xmin - center + 0.5) * ss);
            k[x] = w;
            ww += w;
        }
        for (x = 0; x < xmax; ++x) {
            if (ww != 0.0) k[x] /= ww;
        }
        for (; x < ksize; ++x) k[x] = 0.0;
        bounds[xx * 2 + 0] = xmin;
        bounds[xx * 2 + 1] = xmax;
    }

    // Pillow normalize_coeffs_8bpc: round to fixed point
    kk_fixed.resize(kk.size());
    for (size_t i = 0; i < kk.size(); ++i) {
        double v = kk[i];
        kk_fixed[i] = v < 0 ? static_cast<int>(-0.5 + v * (1 << kPrecisionBits))
                            : static_cast<int>(0.5 + v * (1 << kPrecisionBits));
    }
    return ksize;
}

inline uint8_t clip8(int in) {
    if (in >= (1 << kPrecisionBits << 8)) return 255;
    if (in <= 0) return 0;
    return static_cast<uint8_t>(in >> kPrecisionBits);
}

// horizontal pass: [h, in_w, 3] -> [h, out_w, 3].
// One sweep per output pixel with three channel accumulators (instead of
// re-walking the taps per channel): the taps' 3-byte-strided loads happen
// once and the three multiply-accumulate chains run independently — ~2x
// faster than the per-channel form at -O3 (measured; Pillow gets the same
// effect from its 4-byte RGBX pixels).
void resample_horiz(const uint8_t* in, int h, int in_w, uint8_t* out,
                    int out_w, const std::vector<int>& bounds,
                    const std::vector<int>& kk, int ksize) {
    for (int yy = 0; yy < h; ++yy) {
        const uint8_t* row = in + static_cast<size_t>(yy) * in_w * 3;
        uint8_t* orow = out + static_cast<size_t>(yy) * out_w * 3;
        for (int xx = 0; xx < out_w; ++xx) {
            int xmin = bounds[xx * 2 + 0];
            int xmax = bounds[xx * 2 + 1];
            const int* k = &kk[static_cast<size_t>(xx) * ksize];
            const uint8_t* p = row + static_cast<size_t>(xmin) * 3;
            int s0 = 1 << (kPrecisionBits - 1);
            int s1 = s0, s2 = s0;
            for (int x = 0; x < xmax; ++x) {
                const int w = k[x];
                s0 += p[0] * w;
                s1 += p[1] * w;
                s2 += p[2] * w;
                p += 3;
            }
            orow[xx * 3 + 0] = clip8(s0);
            orow[xx * 3 + 1] = clip8(s1);
            orow[xx * 3 + 2] = clip8(s2);
        }
    }
}

// vertical pass: [in_h, w, 3] -> [out_h, w, 3]
void resample_vert(const uint8_t* in, int in_h, int w, uint8_t* out,
                   int out_h, const std::vector<int>& bounds,
                   const std::vector<int>& kk, int ksize) {
    for (int yy = 0; yy < out_h; ++yy) {
        int ymin = bounds[yy * 2 + 0];
        int ymax = bounds[yy * 2 + 1];
        const int* k = &kk[static_cast<size_t>(yy) * ksize];
        uint8_t* orow = out + static_cast<size_t>(yy) * w * 3;
        for (int xx = 0; xx < w * 3; ++xx) {
            int ss = 1 << (kPrecisionBits - 1);
            for (int y = 0; y < ymax; ++y)
                ss += in[static_cast<size_t>(ymin + y) * w * 3 + xx] * k[y];
            orow[xx] = clip8(ss);
        }
    }
}

// Pillow-compatible box resize: in [in_h, in_w, 3] region (box) -> out.
void resample(const uint8_t* in, int in_h, int in_w,
              double box_x0, double box_y0, double box_x1, double box_y1,
              uint8_t* out, int out_h, int out_w, int filter_id) {
    Filter f = get_filter(filter_id);
    std::vector<int> hb, vb, hk, vk;
    int hks = precompute_coeffs(in_w, box_x0, box_x1, out_w, f, hb, hk);
    int vks = precompute_coeffs(in_h, box_y0, box_y1, out_h, f, vb, vk);

    // horizontal first over the rows the vertical pass needs
    int ymin = vb[0];
    int ymax = 0;
    for (int yy = 0; yy < out_h; ++yy)
        ymax = std::max(ymax, vb[yy * 2 + 0] + vb[yy * 2 + 1]);
    std::vector<uint8_t> tmp(static_cast<size_t>(ymax - ymin) * out_w * 3);
    resample_horiz(in + static_cast<size_t>(ymin) * in_w * 3, ymax - ymin,
                   in_w, tmp.data(), out_w, hb, hk, hks);
    // shift vertical bounds into tmp space
    for (int yy = 0; yy < out_h; ++yy) vb[yy * 2 + 0] -= ymin;
    resample_vert(tmp.data(), ymax - ymin, out_w, out, out_h, vb, vk, vks);
}

}  // namespace

extern "C" {

// Probe JPEG dimensions without a full decode. Returns 0 on success.
int vtx_jpeg_dims(const uint8_t* data, size_t len, int* w, int* h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_error_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    *w = cinfo.image_width;
    *h = cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Full decode to RGB. out must hold w*h*3 bytes (dims from vtx_jpeg_dims).
int vtx_jpeg_decode(const uint8_t* data, size_t len, uint8_t* out,
                    int out_w, int out_h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_error_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    if (static_cast<int>(cinfo.output_width) != out_w ||
        static_cast<int>(cinfo.output_height) != out_h) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    std::vector<JSAMPROW> rows(cinfo.output_height);
    for (unsigned y = 0; y < cinfo.output_height; ++y)
        rows[y] = out + static_cast<size_t>(y) * out_w * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        jpeg_read_scanlines(&cinfo, &rows[cinfo.output_scanline],
                            cinfo.output_height - cinfo.output_scanline);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Pillow-compatible crop + resize on a raw RGB buffer.
// filter: 0 = bicubic, 1 = bilinear.
int vtx_resize(const uint8_t* in, int in_h, int in_w,
               int box_x, int box_y, int box_w, int box_h,
               uint8_t* out, int out_h, int out_w, int filter) {
    if (box_x < 0 || box_y < 0 || box_w <= 0 || box_h <= 0 ||
        box_x + box_w > in_w || box_y + box_h > in_h)
        return 1;
    resample(in, in_h, in_w,
             box_x, box_y, box_x + box_w, box_y + box_h,
             out, out_h, out_w, filter);
    return 0;
}

// Fused: JPEG decode + crop + resize (the per-sample host hot path).
//
// Decodes ONLY the region the resample kernel reads: libjpeg-turbo's
// jpeg_crop_scanline / jpeg_skip_scanlines restrict IDCT + upsampling to the
// crop box plus a margin of (filter support + one iMCU) pixels, so a small
// RandomResizedCrop touches a fraction of the image's DCT blocks.  The
// margin guarantees (a) every resample tap lands strictly inside the decoded
// region (Pillow's kernel reads up to `support` pixels OUTSIDE the box —
// clipping only at true image edges, where the region edge coincides), and
// (b) the iMCU guard absorbs any fancy-upsampling context effects at the
// region boundary — so the output stays bit-identical to a full decode.
//
// max_denom > 1 additionally enables DCT-domain scaled decode (libjpeg
// scale_num/scale_denom, the Image.draft() trick): when the crop is at least
// 2/4/8x the target, the IDCT itself produces the downscaled pixels and the
// Pillow resampler runs on 4-64x fewer of them.  NOT bit-identical to the
// full-resolution path (a resolution pyramid never is) — opt-in via
// vtx_decode_crop_resize_fast.
static int decode_region_resample(const uint8_t* data, size_t len,
                                  double box_x0, double box_y0,
                                  double box_x1, double box_y1,
                                  uint8_t* out, int out_h, int out_w,
                                  int filter, int max_denom, bool strict) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_error_exit;
    std::vector<uint8_t> region;
    std::vector<JSAMPROW> rows;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    const int W = static_cast<int>(cinfo.image_width);
    const int H = static_cast<int>(cinfo.image_height);
    if (strict &&
        (box_x0 < 0.0 || box_y0 < 0.0 || box_x1 > W || box_y1 > H)) {
        // integer callers: out-of-bounds boxes are bugs — reject (the
        // caller falls back to PIL) rather than silently decode a clamped,
        // geometrically wrong crop
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    // float-box tolerance: clamp sub-ULP spill from coordinate arithmetic
    box_x0 = std::max(box_x0, 0.0);
    box_y0 = std::max(box_y0, 0.0);
    box_x1 = std::min(box_x1, static_cast<double>(W));
    box_y1 = std::min(box_y1, static_cast<double>(H));
    if (box_x1 <= box_x0 || box_y1 <= box_y0 || out_w <= 0 || out_h <= 0) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    cinfo.out_color_space = JCS_RGB;

    int denom = 1;
    for (int cand = max_denom; cand > 1; cand >>= 1) {
        if (box_x1 - box_x0 >= static_cast<double>(out_w) * cand &&
            box_y1 - box_y0 >= static_cast<double>(out_h) * cand) {
            denom = cand;
            break;
        }
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = static_cast<unsigned>(denom);
    jpeg_calc_output_dimensions(&cinfo);
    const int SW = static_cast<int>(cinfo.output_width);
    const int SH = static_cast<int>(cinfo.output_height);
    const double sx = static_cast<double>(SW) / W;
    const double sy = static_cast<double>(SH) / H;
    double bx0 = box_x0 * sx, bx1 = box_x1 * sx;
    double by0 = box_y0 * sy, by1 = box_y1 * sy;

    const Filter f = get_filter(filter);
    const double fsx = std::max((bx1 - bx0) / out_w, 1.0);
    const double fsy = std::max((by1 - by0) / out_h, 1.0);
    const int mx = static_cast<int>(std::ceil(f.support * fsx)) + 1 + 16;
    const int my = static_cast<int>(std::ceil(f.support * fsy)) + 1 + 16;
    const int rx0 = std::max(0, static_cast<int>(std::floor(bx0)) - mx);
    const int rx1 = std::min(SW, static_cast<int>(std::ceil(bx1)) + mx);
    const int ry0 = std::max(0, static_cast<int>(std::floor(by0)) - my);
    const int ry1 = std::min(SH, static_cast<int>(std::ceil(by1)) + my);

    jpeg_start_decompress(&cinfo);

    JDIMENSION xoff = static_cast<JDIMENSION>(rx0);
    JDIMENSION xw = static_cast<JDIMENSION>(rx1 - rx0);
    if (rx0 > 0 || rx1 < SW) {
        // adjusted outward to iMCU boundaries by libjpeg
        jpeg_crop_scanline(&cinfo, &xoff, &xw);
    }
    if (ry0 > 0) jpeg_skip_scanlines(&cinfo, static_cast<JDIMENSION>(ry0));
    const int y_start = static_cast<int>(cinfo.output_scanline);
    const int n_rows = ry1 - y_start;
    if (n_rows <= 0 || static_cast<int>(xw) <= 0) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    region.resize(static_cast<size_t>(n_rows) * xw * 3);
    rows.resize(n_rows);
    for (int y = 0; y < n_rows; ++y)
        rows[y] = region.data() + static_cast<size_t>(y) * xw * 3;
    while (static_cast<int>(cinfo.output_scanline) < ry1) {
        const int done = static_cast<int>(cinfo.output_scanline) - y_start;
        jpeg_read_scanlines(&cinfo, &rows[done],
                            static_cast<JDIMENSION>(ry1) - cinfo.output_scanline);
    }
    // remaining scanlines are intentionally unread; destroy releases the
    // decompressor without requiring jpeg_finish_decompress
    jpeg_destroy_decompress(&cinfo);

    resample(region.data(), n_rows, static_cast<int>(xw),
             bx0 - xoff, by0 - y_start, bx1 - xoff, by1 - y_start,
             out, out_h, out_w, filter);
    return 0;
}

int vtx_decode_crop_resize(const uint8_t* data, size_t len,
                           int box_x, int box_y, int box_w, int box_h,
                           uint8_t* out, int out_h, int out_w, int filter) {
    if (box_x < 0 || box_y < 0 || box_w <= 0 || box_h <= 0) return 1;
    return decode_region_resample(data, len, box_x, box_y,
                                  static_cast<double>(box_x) + box_w,
                                  static_cast<double>(box_y) + box_h,
                                  out, out_h, out_w, filter, 1, true);
}

// DCT-scaled variant: up to 8x8 fewer pixels through IDCT + resample when
// the crop is much larger than the target.  Quality-neutral for training
// augmentation (the bicubic low-pass dominates) but not bit-identical.
int vtx_decode_crop_resize_fast(const uint8_t* data, size_t len,
                                int box_x, int box_y, int box_w, int box_h,
                                uint8_t* out, int out_h, int out_w, int filter) {
    if (box_x < 0 || box_y < 0 || box_w <= 0 || box_h <= 0) return 1;
    return decode_region_resample(data, len, box_x, box_y,
                                  static_cast<double>(box_x) + box_w,
                                  static_cast<double>(box_y) + box_h,
                                  out, out_h, out_w, filter, 8, true);
}

// Float-coordinate box: decode + resample the sub-pixel region [x0,x1)x[y0,y1)
// to (out_h, out_w).  Bit-identical to Pillow resize((NW, NH)) of the whole
// image followed by an integer crop whose box maps back to these source
// coordinates: the resample centers ((x0 + (i+0.5)*(x1-x0)/out_w)) and the
// filter scale ((x1-x0)/out_w) coincide column-for-column with the full
// resize's, so the coefficient tables are identical — this fuses the
// reference eval transform Resize(short side)+CenterCrop into ONE region
// decode (reference factory.py:217-224).
int vtx_decode_fbox_resize(const uint8_t* data, size_t len,
                           double x0, double y0, double x1, double y1,
                           uint8_t* out, int out_h, int out_w, int filter) {
    return decode_region_resample(data, len, x0, y0, x1, y1,
                                  out, out_h, out_w, filter, 1, false);
}

}  // extern "C"
