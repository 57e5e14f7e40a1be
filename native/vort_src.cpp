// Native vorticity-source FIFO stream runtime.
//
// The reference reads its forcing stream synchronously on the model thread:
// one blocking flag-byte read per step, plus nx*ny float32s when flag==1
// (reference: src/vorticity_source.cpp:112-133; producer protocol
// src/vort_src_input.cpp:43-61). That serializes producer I/O with the
// solve. Here the protocol lives on a C++ prefetch thread with a one-step
// lookahead slot: while the device integrates step k, the thread is already
// blocked on the pipe for step k+1's flag, so the hot loop only pays a
// mutex+memcpy when a new field actually arrived (SURVEY.md hard-part 4).
//
// Reads use poll() with a short timeout so teardown never deadlocks on a
// silent producer.
//
// Exposed C ABI (driven from Python via ctypes, io/native_stream.py):
//   xfb_src_open(path, n_floats)          -> handle (NULL on failure)
//   xfb_src_next(handle, out, n)          -> 1 new field copied into out,
//                                            0 unchanged, -1 protocol error
//   xfb_src_close(handle)
// Producer side (reference C8):
//   xfb_src_write_step(fd, data|null, n)  -> 0 ok / -1 error

#include <fcntl.h>
#include <poll.h>
#include <unistd.h>

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct SrcStream {
    int fd = -1;
    size_t n = 0;
    std::vector<float> slot;      // prefetched field (valid iff slot_full)
    bool slot_full = false;
    bool eof = false;
    bool error = false;
    int pending_steps = 0;        // protocol steps read ahead of consumer
    std::mutex mu;
    std::condition_variable cv;
    std::thread worker;
    bool stop = false;

    // Read exactly nbytes, polling so `stop` is honored. Returns bytes read
    // (< nbytes only on EOF/stop).
    size_t read_exact(void *buf, size_t nbytes) {
        size_t off = 0;
        while (off < nbytes) {
            {
                std::lock_guard<std::mutex> lk(mu);
                if (stop) return off;
            }
            struct pollfd p = {fd, POLLIN, 0};
            int pr = ::poll(&p, 1, 100 /* ms */);
            if (pr < 0) return off;
            if (pr == 0) continue;  // timeout: re-check stop
            ssize_t r = ::read(fd, (char *)buf + off, nbytes - off);
            if (r <= 0) return off;  // EOF or error
            off += (size_t)r;
        }
        return off;
    }

    void run() {
        std::vector<float> local(n);
        for (;;) {
            {
                std::unique_lock<std::mutex> lk(mu);
                // keep at most ONE step of lookahead: the protocol is
                // self-clocked per model step (vort_src_input.cpp:43-61);
                // reading further ahead would desynchronize forcing times.
                cv.wait(lk, [&] { return stop || pending_steps < 1; });
                if (stop) return;
            }
            uint8_t flag;
            size_t got = read_exact(&flag, 1);
            std::unique_lock<std::mutex> lk(mu);
            if (stop) return;
            if (got != 1) {
                // reference fallback: missing flag => flag=0 forever
                // (vorticity_source.cpp:116-119)
                eof = true;
                cv.notify_all();
                return;
            }
            if (flag == 1) {
                lk.unlock();
                size_t want = n * sizeof(float);
                size_t off = read_exact(local.data(), want);
                lk.lock();
                if (stop) return;
                if (off != want) {   // pipe died mid-field: hard error
                    error = true;
                    cv.notify_all();
                    return;
                }
                slot.assign(local.begin(), local.end());
                slot_full = true;
            }
            pending_steps++;
            cv.notify_all();
        }
    }
};

}  // namespace

extern "C" {

void *xfb_src_open(const char *path, size_t n_floats) {
    int fd = ::open(path, O_RDONLY);    // blocks until a writer connects,
    if (fd < 0) return nullptr;         // like the reference's fopen "rb"
    auto *s = new SrcStream();
    s->fd = fd;
    s->n = n_floats;
    s->worker = std::thread([s] { s->run(); });
    return s;
}

// Consume one protocol step. Blocks until the prefetch thread has it
// (normally it already does). Copies the new field into out iff a new one
// arrived this step.
int xfb_src_next(void *handle, float *out, size_t n) {
    auto *s = static_cast<SrcStream *>(handle);
    if (s == nullptr || n != s->n) return -1;
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv.wait(lk, [&] {
        return s->pending_steps > 0 || s->eof || s->error;
    });
    if (s->error) return -1;
    if (s->pending_steps == 0) return 0;  // drained: flag=0 forever
    s->pending_steps--;
    int ret = 0;
    if (s->slot_full) {
        std::memcpy(out, s->slot.data(), n * sizeof(float));
        s->slot_full = false;
        ret = 1;
    }
    s->cv.notify_all();
    return ret;
}

void xfb_src_close(void *handle) {
    auto *s = static_cast<SrcStream *>(handle);
    if (s == nullptr) return;
    {
        std::lock_guard<std::mutex> lk(s->mu);
        s->stop = true;
        s->cv.notify_all();
    }
    if (s->worker.joinable()) s->worker.join();  // poll() bounds the wait
    ::close(s->fd);
    delete s;
}

// Producer: one protocol step onto an open fd (reference
// vort_src_input.cpp:43-61). data==nullptr emits flag=0.
int xfb_src_write_step(int fd, const float *data, size_t n) {
    uint8_t flag = data ? 1 : 0;
    if (::write(fd, &flag, 1) != 1) return -1;
    if (data) {
        size_t want = n * sizeof(float), off = 0;
        const char *p = (const char *)data;
        while (off < want) {
            ssize_t w = ::write(fd, p + off, want - off);
            if (w <= 0) return -1;
            off += (size_t)w;
        }
    }
    return 0;
}

}  // extern "C"
