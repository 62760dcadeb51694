// Fast JSONL -> columnar event parser (the native data-loader core).
//
// The reference ingests Kaggle JSONL with pandas.read_json in 100k-session
// chunks (~15 min, reference: etl/jsonl_to_parquet.py:59-84). This is the
// native replacement: a single-pass streaming parser specialized to the
// OTTO schema, emitting flat int32/int8 columns ready for device upload.
//
// Exposed C ABI (consumed via ctypes from otto_tpu.data.jsonl):
//   parse_sessions_jsonl(path, &session, &aid, &ts, &type) -> n_events (<0 on error)
//   parse_labels_jsonl(path, &session, &type, &aid)        -> n_labels  (<0 on error)
//   otto_free(ptr)
//
// Schema per line:
//   sessions: {"session": S, "events": [{"aid": A, "ts": T, "type": "clicks"}, ...]}
//   labels:   {"session": S, "labels": {"clicks": A, "carts": [A...], "orders": [A...]}}
//
// ts is converted from milliseconds to seconds (reference:
// etl/jsonl_to_parquet.py:28) when values exceed 1e11.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Cursor {
  const char* p;
  const char* end;
};

inline void skip_ws(Cursor& c) {
  while (c.p < c.end && (*c.p == ' ' || *c.p == '\t')) ++c.p;
}

// Find the next occurrence of `key` (a quoted JSON key) from the cursor.
inline bool seek_key(Cursor& c, const char* key) {
  size_t klen = std::strlen(key);
  const char* found = static_cast<const char*>(
      memmem(c.p, static_cast<size_t>(c.end - c.p), key, klen));
  if (!found) return false;
  c.p = found + klen;
  return true;
}

inline bool parse_int(Cursor& c, int64_t* out) {
  skip_ws(c);
  while (c.p < c.end && (*c.p == ':' || *c.p == ' ')) ++c.p;
  bool neg = false;
  if (c.p < c.end && *c.p == '-') {
    neg = true;
    ++c.p;
  }
  if (c.p >= c.end || *c.p < '0' || *c.p > '9') return false;
  int64_t v = 0;
  while (c.p < c.end && *c.p >= '0' && *c.p <= '9') {
    v = v * 10 + (*c.p - '0');
    ++c.p;
  }
  *out = neg ? -v : v;
  return true;
}

inline int32_t ts_to_seconds(int64_t ts) {
  // Kaggle timestamps are epoch milliseconds (reference converts /1000,
  // etl/jsonl_to_parquet.py:28); synthetic data may already be seconds.
  return static_cast<int32_t>(ts > 100000000000LL ? ts / 1000 : ts);
}

inline int8_t parse_type(Cursor& c) {
  // cursor sits after "type"; expect ':' then quoted string
  while (c.p < c.end && *c.p != '"') ++c.p;
  if (c.p >= c.end) return -1;
  ++c.p;
  char ch = (c.p < c.end) ? *c.p : 0;
  // clicks / carts / orders distinguished by first two chars
  if (ch == 'o') return 2;
  if (ch == 'c' && c.p + 1 < c.end) return (c.p[1] == 'l') ? 0 : 1;
  return -1;
}

template <typename T>
T* to_heap(const std::vector<T>& v) {
  T* out = static_cast<T*>(std::malloc(v.size() * sizeof(T)));
  if (out && !v.empty()) std::memcpy(out, v.data(), v.size() * sizeof(T));
  return out;
}

// Read whole file into memory (events files are a few GB max; streamed
// chunking can be added behind the same ABI if needed).
char* read_file(const char* path, size_t* len) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  char* buf = static_cast<char*>(std::malloc(static_cast<size_t>(sz)));
  if (!buf) {
    std::fclose(f);
    return nullptr;
  }
  size_t rd = std::fread(buf, 1, static_cast<size_t>(sz), f);
  std::fclose(f);
  if (rd != static_cast<size_t>(sz)) {
    std::free(buf);
    return nullptr;
  }
  *len = rd;
  return buf;
}

}  // namespace

extern "C" {

int64_t parse_sessions_jsonl(const char* path, int32_t** session_out,
                             int32_t** aid_out, int32_t** ts_out,
                             int8_t** type_out) {
  size_t len = 0;
  char* buf = read_file(path, &len);
  if (!buf) return -1;

  std::vector<int32_t> session, aid, ts;
  std::vector<int8_t> type;
  session.reserve(1 << 20);
  aid.reserve(1 << 20);
  ts.reserve(1 << 20);
  type.reserve(1 << 20);

  const char* p = buf;
  const char* end = buf + len;
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    Cursor c{p, line_end};
    int64_t sid;
    if (seek_key(c, "\"session\"") && parse_int(c, &sid)) {
      // iterate events: each has "aid" then "ts" then "type"
      while (seek_key(c, "\"aid\"")) {
        int64_t a, t;
        if (!parse_int(c, &a)) break;
        if (!seek_key(c, "\"ts\"") || !parse_int(c, &t)) break;
        if (!seek_key(c, "\"type\"")) break;
        int8_t ty = parse_type(c);
        if (ty < 0) break;
        session.push_back(static_cast<int32_t>(sid));
        aid.push_back(static_cast<int32_t>(a));
        ts.push_back(ts_to_seconds(t));
        type.push_back(ty);
      }
    }
    p = line_end + 1;
  }
  std::free(buf);

  *session_out = to_heap(session);
  *aid_out = to_heap(aid);
  *ts_out = to_heap(ts);
  *type_out = to_heap(type);
  return static_cast<int64_t>(session.size());
}

int64_t parse_labels_jsonl(const char* path, int32_t** session_out,
                           int8_t** type_out, int32_t** aid_out) {
  size_t len = 0;
  char* buf = read_file(path, &len);
  if (!buf) return -1;

  std::vector<int32_t> session, aid;
  std::vector<int8_t> type;

  const char* p = buf;
  const char* end = buf + len;
  const char* keys[3] = {"\"clicks\"", "\"carts\"", "\"orders\""};
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    Cursor base{p, line_end};
    int64_t sid;
    if (seek_key(base, "\"session\"") && parse_int(base, &sid)) {
      for (int t = 0; t < 3; ++t) {
        Cursor c = base;  // each label key searched from after "session"
        if (!seek_key(c, keys[t])) continue;
        // value: either a single int or an array of ints
        skip_ws(c);
        while (c.p < c.end && (*c.p == ':' || *c.p == ' ')) ++c.p;
        if (c.p < c.end && *c.p == '[') {
          ++c.p;
          while (true) {
            int64_t a;
            if (!parse_int(c, &a)) break;
            session.push_back(static_cast<int32_t>(sid));
            type.push_back(static_cast<int8_t>(t));
            aid.push_back(static_cast<int32_t>(a));
            skip_ws(c);
            if (c.p < c.end && *c.p == ',') {
              ++c.p;
              continue;
            }
            break;
          }
        } else {
          int64_t a;
          if (parse_int(c, &a)) {
            session.push_back(static_cast<int32_t>(sid));
            type.push_back(static_cast<int8_t>(t));
            aid.push_back(static_cast<int32_t>(a));
          }
        }
      }
    }
    p = line_end + 1;
  }
  std::free(buf);

  *session_out = to_heap(session);
  *type_out = to_heap(type);
  *aid_out = to_heap(aid);
  return static_cast<int64_t>(session.size());
}

void otto_free(void* ptr) { std::free(ptr); }

}  // extern "C"
