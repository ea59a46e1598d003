// Native UDP batch receiver: epoll + recvmmsg across many sockets.
//
// The threadshare runtime's design point (generic/threadshare/src/runtime:
// many streams, few threads, amortized wakeups) implemented as a native
// drain loop: one epoll instance watches N UDP sockets; each ready socket
// is drained with recvmmsg (up to BATCH datagrams per syscall) into a
// caller-provided arena.  Python (ts-udpsrc / the benchmark harness) gets
// whole batches per call instead of one datagram per GIL round trip.
//
// C ABI (ctypes):
//   gstpu_netio_new()                      -> handle
//   gstpu_netio_add_socket(h, fd, tag)     -> 0/-1
//   gstpu_netio_poll(h, buf, buf_len,
//                    hdrs, max_msgs,
//                    timeout_ms)           -> n_msgs (hdrs: tag,len pairs)
//   gstpu_netio_free(h)
#include <cstdint>
#include <cstring>
#include <map>
#include <sys/epoll.h>
#include <sys/socket.h>
#include <unistd.h>

namespace {

constexpr int kBatch = 64;
constexpr size_t kMaxDgram = 2048;

struct NetIo {
  int epfd = -1;
  std::map<int, uint32_t> tags;  // fd -> caller tag
};

}  // namespace

extern "C" {

void* gstpu_netio_new() {
  NetIo* io = new NetIo();
  io->epfd = epoll_create1(0);
  if (io->epfd < 0) {
    delete io;
    return nullptr;
  }
  return io;
}

int gstpu_netio_add_socket(void* handle, int fd, uint32_t tag) {
  NetIo* io = static_cast<NetIo*>(handle);
  epoll_event ev{};
  ev.events = EPOLLIN;
  ev.data.fd = fd;
  if (epoll_ctl(io->epfd, EPOLL_CTL_ADD, fd, &ev) < 0) return -1;
  io->tags[fd] = tag;
  return 0;
}

int gstpu_netio_remove_socket(void* handle, int fd) {
  NetIo* io = static_cast<NetIo*>(handle);
  epoll_ctl(io->epfd, EPOLL_CTL_DEL, fd, nullptr);
  io->tags.erase(fd);
  return 0;
}

// hdrs layout per message: [tag u32][len u32]; payloads packed back to back
// into buf.  Returns number of messages received (0 on timeout).
int gstpu_netio_poll(void* handle, uint8_t* buf, int64_t buf_len,
                     uint32_t* hdrs, int max_msgs, int timeout_ms) {
  NetIo* io = static_cast<NetIo*>(handle);
  epoll_event events[64];
  int nev = epoll_wait(io->epfd, events, 64, timeout_ms);
  if (nev <= 0) return 0;

  int total_msgs = 0;
  int64_t buf_off = 0;

  mmsghdr msgs[kBatch];
  iovec iovs[kBatch];
  static thread_local uint8_t scratch[kBatch][kMaxDgram];

  for (int e = 0; e < nev && total_msgs < max_msgs; e++) {
    int fd = events[e].data.fd;
    uint32_t tag = io->tags.count(fd) ? io->tags[fd] : 0xFFFFFFFF;
    for (;;) {
      int want = kBatch;
      if (want > max_msgs - total_msgs) want = max_msgs - total_msgs;
      if (want <= 0) break;
      memset(msgs, 0, sizeof(mmsghdr) * want);
      for (int i = 0; i < want; i++) {
        iovs[i] = {scratch[i], kMaxDgram};
        msgs[i].msg_hdr.msg_iov = &iovs[i];
        msgs[i].msg_hdr.msg_iovlen = 1;
      }
      int n = recvmmsg(fd, msgs, want, MSG_DONTWAIT, nullptr);
      if (n <= 0) break;
      for (int i = 0; i < n; i++) {
        uint32_t len = msgs[i].msg_len;
        if (buf_off + len > buf_len) return total_msgs;  // arena full
        memcpy(buf + buf_off, scratch[i], len);
        hdrs[2 * total_msgs] = tag;
        hdrs[2 * total_msgs + 1] = len;
        buf_off += len;
        total_msgs++;
        if (total_msgs >= max_msgs) break;
      }
      if (n < want) break;  // socket drained
    }
  }
  return total_msgs;
}

void gstpu_netio_free(void* handle) {
  NetIo* io = static_cast<NetIo*>(handle);
  if (io->epfd >= 0) close(io->epfd);
  delete io;
}

}  // extern "C"
