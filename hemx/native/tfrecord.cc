// Native TFRecord reader/writer + CRC32C for the hemx data layer.
//
// The reference delegated record IO to TensorFlow's C++ kernels
// (TFRecordDataset / TFRecordWriter); this is hemx's native equivalent,
// exposed as the CPython extension `hemx.data._native` with pure-Python
// fallbacks in hemx/data/tfrecord.py and hemx/summaries/crc32c.py.
//
// Format per record:
//   uint64 length | uint32 masked_crc32c(length) | payload
//   | uint32 masked_crc32c(payload)
//
// CRC32C here is a slicing-by-8 table implementation (~1 GB/s+), an order
// of magnitude faster than the Python table loop; reading returns a Python
// list of bytes objects in one pass.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <exception>
#include <string>
#include <vector>

namespace {

uint32_t g_tables[8][256];
bool g_tables_init = false;

void init_tables() {
  if (g_tables_init) return;
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ poly : c >> 1;
    g_tables[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = g_tables[0][i];
    for (int t = 1; t < 8; ++t) {
      c = g_tables[0][c & 0xFF] ^ (c >> 8);
      g_tables[t][i] = c;
    }
  }
  g_tables_init = true;
}

uint32_t crc32c(const uint8_t* data, size_t len, uint32_t crc = 0) {
  init_tables();
  crc ^= 0xFFFFFFFFu;
  // slicing-by-8
  while (len >= 8) {
    uint32_t lo;
    uint32_t hi;
    std::memcpy(&lo, data, 4);
    std::memcpy(&hi, data + 4, 4);
    lo ^= crc;
    crc = g_tables[7][lo & 0xFF] ^ g_tables[6][(lo >> 8) & 0xFF] ^
          g_tables[5][(lo >> 16) & 0xFF] ^ g_tables[4][lo >> 24] ^
          g_tables[3][hi & 0xFF] ^ g_tables[2][(hi >> 8) & 0xFF] ^
          g_tables[1][(hi >> 16) & 0xFF] ^ g_tables[0][hi >> 24];
    data += 8;
    len -= 8;
  }
  while (len--) crc = g_tables[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

inline uint32_t mask_crc(uint32_t crc) {
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

struct File {
  FILE* f;
  explicit File(const char* path, const char* mode) : f(fopen(path, mode)) {}
  ~File() { if (f) fclose(f); }
};

PyObject* py_crc32c(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  uint32_t crc = crc32c(static_cast<const uint8_t*>(buf.buf),
                        static_cast<size_t>(buf.len));
  PyBuffer_Release(&buf);
  return PyLong_FromUnsignedLong(crc);
}

PyObject* py_masked_crc32c(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  uint32_t crc = mask_crc(crc32c(static_cast<const uint8_t*>(buf.buf),
                                 static_cast<size_t>(buf.len)));
  PyBuffer_Release(&buf);
  return PyLong_FromUnsignedLong(crc);
}

PyObject* py_read_all_records(PyObject*, PyObject* args) {
  const char* path;
  int verify = 0;
  if (!PyArg_ParseTuple(args, "s|p", &path, &verify)) return nullptr;
  File file(path, "rb");
  if (!file.f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  // Read payloads without the GIL, then build Python objects.
  std::vector<std::string> records;
  bool corrupt = false;
  bool oom = false;
  // EOF mid-record (after a full header) = partially written file; silence
  // here would train on a silently shortened dataset.
  bool truncated = false;
  Py_BEGIN_ALLOW_THREADS
  // Bound every payload length against the file size BEFORE allocating:
  // a garbage header (verify defaults off, so its CRC is unchecked) could
  // otherwise request e.g. 2^60 bytes, and the resulting std::bad_alloc
  // would escape this no-GIL region with no C++ handler -> std::terminate.
  fseek(file.f, 0, SEEK_END);
  const long long fsize = ftell(file.f);
  fseek(file.f, 0, SEEK_SET);
  try {
    for (;;) {
      uint8_t header[8];
      if (fread(header, 1, 8, file.f) < 8) break;
      uint64_t len;
      std::memcpy(&len, header, 8);
      uint8_t hcrc[4];
      if (fread(hcrc, 1, 4, file.f) < 4) { truncated = true; break; }
      if (verify) {
        uint32_t expect;
        std::memcpy(&expect, hcrc, 4);
        if (mask_crc(crc32c(header, 8)) != expect) { corrupt = true; break; }
      }
      const long long pos = ftell(file.f);
      if (fsize < 0 || pos < 0 ||
          len > static_cast<uint64_t>(fsize - pos)) {
        truncated = true;
        break;
      }
      std::string payload(len, '\0');
      if (len && fread(&payload[0], 1, len, file.f) < len) {
        truncated = true;
        break;
      }
      uint8_t dcrc[4];
      if (fread(dcrc, 1, 4, file.f) < 4) { truncated = true; break; }
      if (verify) {
        uint32_t expect;
        std::memcpy(&expect, dcrc, 4);
        if (mask_crc(crc32c(reinterpret_cast<const uint8_t*>(payload.data()),
                            len)) != expect) { corrupt = true; break; }
      }
      records.push_back(std::move(payload));
    }
  } catch (const std::exception&) {
    // bad_alloc on a legitimately huge file: raise, never terminate.
    oom = true;
  }
  Py_END_ALLOW_THREADS
  if (oom) {
    PyErr_Format(PyExc_MemoryError, "out of memory reading TFRecord %s",
                 path);
    return nullptr;
  }
  if (corrupt) {
    PyErr_Format(PyExc_OSError, "corrupt TFRecord crc in %s", path);
    return nullptr;
  }
  if (truncated) {
    PyErr_Format(PyExc_OSError, "truncated TFRecord file %s: record cut off at EOF", path);
    return nullptr;
  }
  PyObject* list = PyList_New(static_cast<Py_ssize_t>(records.size()));
  if (!list) return nullptr;
  for (Py_ssize_t i = 0; i < static_cast<Py_ssize_t>(records.size()); ++i) {
    PyObject* b = PyBytes_FromStringAndSize(records[i].data(),
                                            records[i].size());
    if (!b) { Py_DECREF(list); return nullptr; }
    PyList_SET_ITEM(list, i, b);
  }
  return list;
}

PyObject* py_count_records(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  File file(path, "rb");
  if (!file.f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  long long n = 0;
  bool truncated = false;
  Py_BEGIN_ALLOW_THREADS
  // fseek past EOF succeeds, so bound every record against the file size
  // instead (a truncated trailing record must error, not count).
  fseek(file.f, 0, SEEK_END);
  const long long size = ftell(file.f);
  fseek(file.f, 0, SEEK_SET);
  for (;;) {
    uint8_t header[8];
    if (fread(header, 1, 8, file.f) < 8) break;
    uint64_t len;
    std::memcpy(&len, header, 8);
    const long long pos = ftell(file.f);
    // Compare in unsigned space: a garbage len >= 2^63 would make the
    // signed end-offset wrap negative and count a partial file as clean.
    if (size < 0 || pos < 0 ||
        len > static_cast<uint64_t>(size - pos) ||
        static_cast<uint64_t>(size - pos) - len < 8) {
      truncated = true;
      break;
    }
    const long long end = pos + static_cast<long long>(len) + 8;
    if (fseek(file.f, static_cast<long>(end), SEEK_SET) != 0) break;
    ++n;
  }
  Py_END_ALLOW_THREADS
  if (truncated) {
    PyErr_Format(PyExc_OSError, "truncated TFRecord file %s: record cut off at EOF", path);
    return nullptr;
  }
  return PyLong_FromLongLong(n);
}

PyObject* py_write_records(PyObject*, PyObject* args) {
  const char* path;
  PyObject* seq;
  if (!PyArg_ParseTuple(args, "sO", &path, &seq)) return nullptr;
  PyObject* fast = PySequence_Fast(seq, "records must be a sequence");
  if (!fast) return nullptr;
  File file(path, "wb");
  if (!file.f) {
    Py_DECREF(fast);
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(fast, i);
    char* data;
    Py_ssize_t len;
    if (PyBytes_AsStringAndSize(item, &data, &len) < 0) {
      Py_DECREF(fast);
      return nullptr;
    }
    uint8_t header[8];
    uint64_t len64 = static_cast<uint64_t>(len);
    std::memcpy(header, &len64, 8);
    uint32_t hcrc = mask_crc(crc32c(header, 8));
    uint32_t dcrc = mask_crc(
        crc32c(reinterpret_cast<const uint8_t*>(data), len));
    // A short fwrite (ENOSPC, I/O error) must raise, not return success
    // with a silently truncated dataset on disk.
    const bool ok =
        fwrite(header, 1, 8, file.f) == 8 &&
        fwrite(&hcrc, 1, 4, file.f) == 4 &&
        (len == 0 ||
         fwrite(data, 1, static_cast<size_t>(len), file.f) ==
             static_cast<size_t>(len)) &&
        fwrite(&dcrc, 1, 4, file.f) == 4;
    if (!ok) {
      Py_DECREF(fast);
      PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
      return nullptr;
    }
  }
  Py_DECREF(fast);
  // Flush while we can still report the error (the File destructor's
  // fclose would swallow it).
  if (fflush(file.f) != 0 || ferror(file.f)) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"crc32c", py_crc32c, METH_VARARGS, "CRC-32C (Castagnoli) of bytes."},
    {"masked_crc32c", py_masked_crc32c, METH_VARARGS,
     "TFRecord-masked CRC-32C of bytes."},
    {"read_all_records", py_read_all_records, METH_VARARGS,
     "read_all_records(path, verify=False) -> list[bytes]"},
    {"count_records", py_count_records, METH_VARARGS,
     "count_records(path) -> int (framing walk, no payload reads)"},
    {"write_records", py_write_records, METH_VARARGS,
     "write_records(path, list[bytes])"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_native",
                      "hemx native TFRecord/CRC32C data-loader", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__native() { return PyModule_Create(&module); }
