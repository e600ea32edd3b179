// Native raw-content KV store (replaces the reference's external
// redis-server for the doc:/doc_index:/doc_meta: keyspace).
//
// In-process hash map guarded by a shared_mutex, gzip (zlib) helpers for
// value compression (same gzip container + level the reference produced
// with Python's gzip module, so stored corpora stay bit-compatible), and
// atomic snapshot persistence (tmp file + rename).
//
// Exposed as a C ABI consumed from Python via ctypes (storage/kv.py).

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <mutex>
#include <shared_mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct KvStore {
  std::unordered_map<std::string, std::string> map;
  mutable std::shared_mutex mu;
  std::string dir;
  std::atomic<uint64_t> dirty{0};
};

constexpr char kMagic[8] = {'M', 'M', 'K', 'V', '0', '0', '0', '1'};

std::string snapshot_path(const std::string& dir) {
  return dir + "/kv.snapshot";
}

bool load_snapshot(KvStore* kv) {
  std::ifstream in(snapshot_path(kv->dir), std::ios::binary);
  if (!in) return false;
  char magic[8];
  in.read(magic, 8);
  if (!in || std::memcmp(magic, kMagic, 8) != 0) return false;
  uint64_t count = 0;
  in.read(reinterpret_cast<char*>(&count), 8);
  for (uint64_t i = 0; i < count && in; ++i) {
    uint32_t klen = 0;
    uint64_t vlen = 0;
    in.read(reinterpret_cast<char*>(&klen), 4);
    in.read(reinterpret_cast<char*>(&vlen), 8);
    if (!in) return false;
    std::string key(klen, '\0'), val(vlen, '\0');
    in.read(key.data(), klen);
    in.read(val.data(), vlen);
    if (!in) return false;
    kv->map.emplace(std::move(key), std::move(val));
  }
  return true;
}

}  // namespace

extern "C" {

void* kv_open(const char* dir) {
  auto* kv = new KvStore();
  kv->dir = dir ? dir : "";
  if (!kv->dir.empty()) load_snapshot(kv);
  return kv;
}

void kv_close(void* h) { delete static_cast<KvStore*>(h); }

int kv_set(void* h, const char* key, size_t klen, const char* val,
           size_t vlen) {
  auto* kv = static_cast<KvStore*>(h);
  std::unique_lock lock(kv->mu);
  kv->map[std::string(key, klen)] = std::string(val, vlen);
  kv->dirty.fetch_add(1, std::memory_order_relaxed);
  return 0;
}

// out buffer is malloc'd; caller frees with kv_free. Returns 1 if found.
int kv_get(void* h, const char* key, size_t klen, char** out,
           size_t* outlen) {
  auto* kv = static_cast<KvStore*>(h);
  std::shared_lock lock(kv->mu);
  auto it = kv->map.find(std::string(key, klen));
  if (it == kv->map.end()) {
    *out = nullptr;
    *outlen = 0;
    return 0;
  }
  *outlen = it->second.size();
  *out = static_cast<char*>(std::malloc(*outlen));
  std::memcpy(*out, it->second.data(), *outlen);
  return 1;
}

int kv_del(void* h, const char* key, size_t klen) {
  auto* kv = static_cast<KvStore*>(h);
  std::unique_lock lock(kv->mu);
  size_t erased = kv->map.erase(std::string(key, klen));
  if (erased) kv->dirty.fetch_add(1, std::memory_order_relaxed);
  return static_cast<int>(erased);
}

long kv_count(void* h) {
  auto* kv = static_cast<KvStore*>(h);
  std::shared_lock lock(kv->mu);
  return static_cast<long>(kv->map.size());
}

// Keys with the given prefix, '\n'-joined. malloc'd; free with kv_free.
int kv_scan(void* h, const char* prefix, size_t plen, char** out,
            size_t* outlen) {
  auto* kv = static_cast<KvStore*>(h);
  std::shared_lock lock(kv->mu);
  std::string joined;
  const std::string pref(prefix, plen);
  for (const auto& [key, _] : kv->map) {
    if (key.compare(0, pref.size(), pref) == 0) {
      joined += key;
      joined += '\n';
    }
  }
  if (!joined.empty()) joined.pop_back();
  *outlen = joined.size();
  *out = static_cast<char*>(std::malloc(joined.size()));
  std::memcpy(*out, joined.data(), joined.size());
  return 0;
}

int kv_clear(void* h) {
  auto* kv = static_cast<KvStore*>(h);
  std::unique_lock lock(kv->mu);
  kv->map.clear();
  kv->dirty.fetch_add(1, std::memory_order_relaxed);
  return 0;
}

// Atomic snapshot: write tmp, rename over the old file.
int kv_save(void* h) {
  auto* kv = static_cast<KvStore*>(h);
  if (kv->dir.empty()) return -1;
  std::shared_lock lock(kv->mu);
  const std::string tmp = snapshot_path(kv->dir) + ".tmp";
  {
    std::ofstream outf(tmp, std::ios::binary | std::ios::trunc);
    if (!outf) return -1;
    outf.write(kMagic, 8);
    uint64_t count = kv->map.size();
    outf.write(reinterpret_cast<char*>(&count), 8);
    for (const auto& [key, val] : kv->map) {
      uint32_t klen = static_cast<uint32_t>(key.size());
      uint64_t vlen = val.size();
      outf.write(reinterpret_cast<char*>(&klen), 4);
      outf.write(reinterpret_cast<char*>(&vlen), 8);
      outf.write(key.data(), klen);
      outf.write(val.data(), vlen);
    }
    if (!outf) return -1;
  }
  if (std::rename(tmp.c_str(), snapshot_path(kv->dir).c_str()) != 0)
    return -1;
  return 0;
}

void kv_free(char* p) { std::free(p); }

// ---------------------------------------------------------------------
// gzip helpers (same container/level semantics as Python's gzip module,
// which the reference used at retriever.py:1008-1014).
// ---------------------------------------------------------------------

int kv_gzip(const char* data, size_t len, int level, char** out,
            size_t* outlen) {
  z_stream zs{};
  // windowBits 15 + 16 → gzip container.
  if (deflateInit2(&zs, level, Z_DEFLATED, 15 + 16, 8,
                   Z_DEFAULT_STRATEGY) != Z_OK)
    return -1;
  uLong bound = deflateBound(&zs, len) + 32;
  *out = static_cast<char*>(std::malloc(bound));
  zs.next_in = reinterpret_cast<Bytef*>(const_cast<char*>(data));
  zs.avail_in = len;
  zs.next_out = reinterpret_cast<Bytef*>(*out);
  zs.avail_out = bound;
  int rc = deflate(&zs, Z_FINISH);
  deflateEnd(&zs);
  if (rc != Z_STREAM_END) {
    std::free(*out);
    *out = nullptr;
    return -1;
  }
  *outlen = bound - zs.avail_out;
  return 0;
}

int kv_gunzip(const char* data, size_t len, char** out, size_t* outlen) {
  z_stream zs{};
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return -1;  // gzip or zlib
  size_t cap = len * 4 + 1024;
  *out = static_cast<char*>(std::malloc(cap));
  zs.next_in = reinterpret_cast<Bytef*>(const_cast<char*>(data));
  zs.avail_in = len;
  size_t total = 0;
  int rc;
  do {
    if (total == cap) {
      cap *= 2;
      *out = static_cast<char*>(std::realloc(*out, cap));
    }
    zs.next_out = reinterpret_cast<Bytef*>(*out + total);
    zs.avail_out = cap - total;
    rc = inflate(&zs, Z_NO_FLUSH);
    total = cap - zs.avail_out;
    if (rc == Z_BUF_ERROR && zs.avail_in == 0) break;
    if (rc != Z_OK && rc != Z_STREAM_END) {
      inflateEnd(&zs);
      std::free(*out);
      *out = nullptr;
      return -1;
    }
  } while (rc != Z_STREAM_END);
  inflateEnd(&zs);
  *outlen = total;
  return 0;
}

}  // extern "C"
