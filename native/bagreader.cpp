// Native rosbag v2.0 decoder for sensor replay.
//
// TPU-native replacement for the reference's ROS-runtime bag playback
// (reference: rosbag::Bag + View inside Tracking::Run,
// src/Tracking.cc:192-246). Instead of per-frame ROS message dispatch,
// this library decodes a whole bag ONCE into packed host arrays (images,
// IMU samples, pressure readings, timestamps) that are shipped to device
// memory as tensors — the per-frame loop then never touches the host.
//
// Supports uncompressed and bz2 chunks (Aqualoc/EuRoC bags); message
// types: sensor_msgs/Image (mono8/bgr8/rgb8), sensor_msgs/Imu,
// sensor_msgs/FluidPressure. Exposed as a C API consumed via ctypes
// (pybind11 is not available in this environment).
//
// Build: scripts/build_native.sh -> libbagreader.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#if defined(HAVE_BZ2)
#if defined(HAVE_BZLIB_H)
#include <bzlib.h>
#else
// libbz2's runtime .so is present without dev headers on this image;
// the decompress entry point has a stable C ABI since bzip2 1.0
extern "C" int BZ2_bzBuffToBuffDecompress(
    char* dest, unsigned int* destLen, char* source, unsigned int sourceLen,
    int small, int verbosity);
#define BZ_OK 0
#endif
#endif

namespace {

struct Connection {
  std::string topic;
  std::string type;
};

struct ImuSample {
  double t;
  double wx, wy, wz;
  double ax, ay, az;
};

struct PressureSample {
  double t;
  double pressure;
  double variance;
};

struct ImageMeta {
  double t;
  uint32_t height, width;
  uint64_t offset;  // into image_data
  uint8_t channels;
};

struct BagData {
  std::vector<ImuSample> imu;
  std::vector<PressureSample> pressure;
  std::vector<ImageMeta> images;
  std::vector<uint8_t> image_data;  // grayscale, concatenated
  std::string error;
};

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t pos = 0;
  bool ok = true;

  bool need(size_t k) {
    if (pos + k > n) { ok = false; return false; }
    return true;
  }
  uint32_t u32() {
    if (!need(4)) return 0;
    uint32_t v;
    memcpy(&v, p + pos, 4);
    pos += 4;
    return v;
  }
  uint8_t u8() {
    if (!need(1)) return 0;
    return p[pos++];
  }
  double f64() {
    if (!need(8)) return 0;
    double v;
    memcpy(&v, p + pos, 8);
    pos += 8;
    return v;
  }
  const uint8_t* bytes(size_t k) {
    if (!need(k)) return nullptr;
    const uint8_t* q = p + pos;
    pos += k;
    return q;
  }
  std::string str() {
    uint32_t len = u32();
    const uint8_t* q = bytes(len);
    return q ? std::string(reinterpret_cast<const char*>(q), len) : std::string();
  }
  void skip(size_t k) { if (need(k)) pos += k; }
};

// parse a record header blob into name->value map
static void parse_header(const uint8_t* h, uint32_t hlen,
                         std::unordered_map<std::string, std::string>* out) {
  size_t pos = 0;
  while (pos + 4 <= hlen) {
    uint32_t flen;
    memcpy(&flen, h + pos, 4);
    pos += 4;
    if (pos + flen > hlen) break;
    const char* field = reinterpret_cast<const char*>(h + pos);
    const char* eq = static_cast<const char*>(memchr(field, '=', flen));
    if (eq) {
      (*out)[std::string(field, eq - field)] =
          std::string(eq + 1, flen - (eq - field) - 1);
    }
    pos += flen;
  }
}

static double header_time(Reader* r) {
  // std_msgs/Header: uint32 seq, time stamp (2x uint32), string frame_id
  r->u32();
  uint32_t sec = r->u32();
  uint32_t nsec = r->u32();
  uint32_t flen = r->u32();
  r->skip(flen);
  return double(sec) + 1e-9 * double(nsec);
}

static void parse_imu(Reader r, BagData* bag) {
  ImuSample s{};
  s.t = header_time(&r);
  // orientation quat (4) + cov (9)
  r.skip(8 * 4 + 8 * 9);
  s.wx = r.f64(); s.wy = r.f64(); s.wz = r.f64();
  r.skip(8 * 9);
  s.ax = r.f64(); s.ay = r.f64(); s.az = r.f64();
  if (r.ok) bag->imu.push_back(s);
}

static void parse_pressure(Reader r, BagData* bag) {
  PressureSample s{};
  s.t = header_time(&r);
  s.pressure = r.f64();
  s.variance = r.f64();
  if (r.ok) bag->pressure.push_back(s);
}

static void parse_image(Reader r, BagData* bag) {
  double t = header_time(&r);
  uint32_t height = r.u32();
  uint32_t width = r.u32();
  std::string encoding = r.str();
  r.u8();                 // is_bigendian
  uint32_t step = r.u32();
  uint32_t dlen = r.u32();
  const uint8_t* data = r.bytes(dlen);
  if (!r.ok || !data || height == 0 || width == 0) return;

  ImageMeta m{};
  m.t = t;
  m.height = height;
  m.width = width;
  m.offset = bag->image_data.size();
  m.channels = 1;
  bag->image_data.reserve(bag->image_data.size() + size_t(height) * width);
  if (encoding == "mono8" || encoding == "8UC1") {
    for (uint32_t y = 0; y < height; y++)
      bag->image_data.insert(bag->image_data.end(), data + size_t(y) * step,
                             data + size_t(y) * step + width);
  } else if (encoding == "bgr8" || encoding == "rgb8") {
    // grayscale conversion (BT.601-ish integer weights); channel order
    // only matters by +-1 gray level, matching cv_bridge "mono8" closely
    bool bgr = encoding == "bgr8";
    for (uint32_t y = 0; y < height; y++) {
      const uint8_t* row = data + size_t(y) * step;
      for (uint32_t x = 0; x < width; x++) {
        uint32_t b = row[3 * x + (bgr ? 0 : 2)];
        uint32_t g = row[3 * x + 1];
        uint32_t rr = row[3 * x + (bgr ? 2 : 0)];
        bag->image_data.push_back(uint8_t((299 * rr + 587 * g + 114 * b) / 1000));
      }
    }
  } else {
    return;  // unsupported encoding: skip frame
  }
  bag->images.push_back(m);
}

static void parse_message_records(const uint8_t* buf, size_t len,
                                  std::unordered_map<uint32_t, Connection>* conns,
                                  const char* image_topic, const char* imu_topic,
                                  const char* pressure_topic, BagData* bag) {
  Reader r{buf, len};
  while (r.ok && r.pos + 8 <= r.n) {
    uint32_t hlen = r.u32();
    const uint8_t* hdr = r.bytes(hlen);
    if (!hdr) break;
    uint32_t dlen = r.u32();
    const uint8_t* data = r.bytes(dlen);
    if (!data) break;

    std::unordered_map<std::string, std::string> h;
    parse_header(hdr, hlen, &h);
    int op = h.count("op") ? h["op"][0] : -1;

    if (op == 7) {  // connection
      uint32_t conn_id = 0;
      if (h.count("conn")) memcpy(&conn_id, h["conn"].data(), 4);
      std::unordered_map<std::string, std::string> ch;
      parse_header(data, dlen, &ch);
      Connection c;
      c.topic = h.count("topic") ? h["topic"] : ch["topic"];
      c.type = ch.count("type") ? ch["type"] : "";
      (*conns)[conn_id] = c;
    } else if (op == 2) {  // message data
      uint32_t conn_id = 0;
      if (h.count("conn")) memcpy(&conn_id, h["conn"].data(), 4);
      auto it = conns->find(conn_id);
      if (it == conns->end()) continue;
      const Connection& c = it->second;
      Reader mr{data, dlen};
      if (c.topic == image_topic && c.type.find("Image") != std::string::npos)
        parse_image(mr, bag);
      else if (c.topic == imu_topic && c.type.find("Imu") != std::string::npos)
        parse_imu(mr, bag);
      else if (c.topic == pressure_topic)
        parse_pressure(mr, bag);
    }
  }
}

static BagData* parse_bag(const char* path, const char* image_topic,
                          const char* imu_topic, const char* pressure_topic) {
  auto* bag = new BagData();
  FILE* f = fopen(path, "rb");
  if (!f) { bag->error = "cannot open file"; return bag; }
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(fsize);
  if (fread(buf.data(), 1, fsize, f) != size_t(fsize)) {
    fclose(f);
    bag->error = "short read";
    return bag;
  }
  fclose(f);

  const char* magic = "#ROSBAG V2.0\n";
  if (fsize < 13 || memcmp(buf.data(), magic, 13) != 0) {
    bag->error = "not a rosbag v2.0 file";
    return bag;
  }

  std::unordered_map<uint32_t, Connection> conns;
  Reader r{buf.data(), size_t(fsize)};
  r.pos = 13;
  while (r.ok && r.pos + 8 <= r.n) {
    uint32_t hlen = r.u32();
    const uint8_t* hdr = r.bytes(hlen);
    if (!hdr) break;
    uint32_t dlen = r.u32();
    const uint8_t* data = r.bytes(dlen);
    if (!data) break;

    std::unordered_map<std::string, std::string> h;
    parse_header(hdr, hlen, &h);
    int op = h.count("op") ? h["op"][0] : -1;

    if (op == 5) {  // chunk
      std::string comp = h.count("compression") ? h["compression"] : "none";
      if (comp == "none") {
        parse_message_records(data, dlen, &conns, image_topic, imu_topic,
                              pressure_topic, bag);
      } else if (comp == "bz2") {
#if defined(HAVE_BZ2)
        uint32_t raw_size = 0;
        if (h.count("size")) memcpy(&raw_size, h["size"].data(), 4);
        std::vector<uint8_t> out(raw_size);
        unsigned int out_len = raw_size;
        int rc = BZ2_bzBuffToBuffDecompress(
            reinterpret_cast<char*>(out.data()), &out_len,
            const_cast<char*>(reinterpret_cast<const char*>(data)), dlen, 0, 0);
        if (rc == BZ_OK)
          parse_message_records(out.data(), out_len, &conns, image_topic,
                                imu_topic, pressure_topic, bag);
#else
        bag->error = "bz2 chunk but built without bz2";
#endif
      }  // lz4 unsupported: skipped
    } else if (op == 7) {  // top-level connection record
      uint32_t conn_id = 0;
      if (h.count("conn")) memcpy(&conn_id, h["conn"].data(), 4);
      std::unordered_map<std::string, std::string> ch;
      parse_header(data, dlen, &ch);
      Connection c;
      c.topic = h.count("topic") ? h["topic"] : ch["topic"];
      c.type = ch.count("type") ? ch["type"] : "";
      conns[conn_id] = c;
    }
    // ops 3 (bag header), 4 (index), 6 (chunk info): skipped
  }
  return bag;
}

}  // namespace

extern "C" {

void* bag_open(const char* path, const char* image_topic,
               const char* imu_topic, const char* pressure_topic) {
  return parse_bag(path, image_topic, imu_topic, pressure_topic);
}

const char* bag_error(void* h) {
  auto* bag = static_cast<BagData*>(h);
  return bag->error.empty() ? nullptr : bag->error.c_str();
}

int64_t bag_n_imu(void* h) { return static_cast<BagData*>(h)->imu.size(); }
int64_t bag_n_pressure(void* h) { return static_cast<BagData*>(h)->pressure.size(); }
int64_t bag_n_images(void* h) { return static_cast<BagData*>(h)->images.size(); }

// imu rows: [t, wx, wy, wz, ax, ay, az]
void bag_copy_imu(void* h, double* out) {
  auto* bag = static_cast<BagData*>(h);
  for (size_t i = 0; i < bag->imu.size(); i++) {
    const auto& s = bag->imu[i];
    double row[7] = {s.t, s.wx, s.wy, s.wz, s.ax, s.ay, s.az};
    memcpy(out + 7 * i, row, sizeof(row));
  }
}

// pressure rows: [t, pressure, variance]
void bag_copy_pressure(void* h, double* out) {
  auto* bag = static_cast<BagData*>(h);
  for (size_t i = 0; i < bag->pressure.size(); i++) {
    const auto& s = bag->pressure[i];
    double row[3] = {s.t, s.pressure, s.variance};
    memcpy(out + 3 * i, row, sizeof(row));
  }
}

// image metadata rows: [t, height, width, offset]
void bag_copy_image_meta(void* h, double* out) {
  auto* bag = static_cast<BagData*>(h);
  for (size_t i = 0; i < bag->images.size(); i++) {
    const auto& m = bag->images[i];
    out[4 * i + 0] = m.t;
    out[4 * i + 1] = m.height;
    out[4 * i + 2] = m.width;
    out[4 * i + 3] = double(m.offset);
  }
}

int64_t bag_image_data_size(void* h) {
  return static_cast<BagData*>(h)->image_data.size();
}

void bag_copy_image_data(void* h, uint8_t* out) {
  auto* bag = static_cast<BagData*>(h);
  memcpy(out, bag->image_data.data(), bag->image_data.size());
}

void bag_close(void* h) { delete static_cast<BagData*>(h); }

}  // extern "C"
