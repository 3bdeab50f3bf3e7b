// Native runtime components for structure_plp_slam_tpu.
//
// The reference framework's runtime is C++ end to end; the pieces that do
// real IO concurrency there are re-implemented here natively and exposed to
// the Python orchestrator over a C ABI (ctypes):
//
//  * SnapshotWriter — double-buffered background checkpoint writer: the
//    SLAM loop hands over a serialized map blob and continues; a worker
//    thread persists it (atomic rename) without stalling tracking.
//    (Reference: map_database_io.cc snapshot save under paused threads —
//    here the pause disappears.)
//  * Publisher — TCP broadcast server streaming length-prefixed binary
//    map/frame packets to any number of viewer clients, with a send thread
//    per connection and latest-wins queueing.
//    (Reference: src/socket_publisher/* streaming protobuf to the node.js
//    viewer.)
//
// Build: make -C native   (produces libplpslam_native.so)

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

// ---------------------------------------------------------------------------
// SnapshotWriter
// ---------------------------------------------------------------------------

struct SnapshotWriter {
    std::string path;
    std::thread worker;
    std::mutex mu;
    std::condition_variable cv;
    std::vector<uint8_t> pending;   // latest submitted blob (latest wins)
    uint64_t pending_seq = 0;
    uint64_t written_seq = 0;
    bool stop = false;

    explicit SnapshotWriter(std::string p) : path(std::move(p)) {
        worker = std::thread([this] { run(); });
    }

    void run() {
        std::unique_lock<std::mutex> lk(mu);
        while (true) {
            cv.wait(lk, [this] { return stop || pending_seq > written_seq; });
            if (stop && pending_seq == written_seq) return;
            std::vector<uint8_t> blob;
            blob.swap(pending);
            uint64_t seq = pending_seq;
            lk.unlock();

            std::string tmp = path + ".tmp";
            FILE* f = std::fopen(tmp.c_str(), "wb");
            if (f) {
                std::fwrite(blob.data(), 1, blob.size(), f);
                std::fclose(f);
                std::rename(tmp.c_str(), path.c_str());
            }

            lk.lock();
            written_seq = seq;
            cv.notify_all();
        }
    }

    void submit(const uint8_t* data, size_t size) {
        std::lock_guard<std::mutex> lk(mu);
        pending.assign(data, data + size);
        ++pending_seq;
        cv.notify_all();
    }

    void wait_idle() {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return written_seq == pending_seq; });
    }

    ~SnapshotWriter() {
        {
            std::lock_guard<std::mutex> lk(mu);
            stop = true;
            cv.notify_all();
        }
        worker.join();
    }
};

// ---------------------------------------------------------------------------
// Publisher
// ---------------------------------------------------------------------------

struct Client {
    int fd;
    std::thread sender;
    std::mutex mu;
    std::condition_variable cv;
    std::vector<uint8_t> next;   // latest packet (latest wins)
    uint64_t seq = 0;
    uint64_t sent = 0;
    bool dead = false;
};

struct Publisher {
    int listen_fd = -1;
    int port = 0;
    std::thread acceptor;
    std::mutex clients_mu;
    std::vector<Client*> clients;
    std::atomic<bool> stop{false};
    std::atomic<uint64_t> packets_sent{0};

    explicit Publisher(int want_port) {
        listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
        int one = 1;
        ::setsockopt(listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
        sockaddr_in addr{};
        addr.sin_family = AF_INET;
        addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
        addr.sin_port = htons(static_cast<uint16_t>(want_port));
        if (::bind(listen_fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
            ::listen(listen_fd, 8) != 0) {
            ::close(listen_fd);
            listen_fd = -1;
            return;
        }
        socklen_t len = sizeof(addr);
        ::getsockname(listen_fd, reinterpret_cast<sockaddr*>(&addr), &len);
        port = ntohs(addr.sin_port);
        acceptor = std::thread([this] { accept_loop(); });
    }

    void accept_loop() {
        while (!stop.load()) {
            int fd = ::accept(listen_fd, nullptr, nullptr);
            if (fd < 0) break;
            int one = 1;
            ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
            auto* c = new Client();
            c->fd = fd;
            c->sender = std::thread([this, c] { send_loop(c); });
            std::lock_guard<std::mutex> lk(clients_mu);
            clients.push_back(c);
        }
    }

    void send_loop(Client* c) {
        std::unique_lock<std::mutex> lk(c->mu);
        while (true) {
            c->cv.wait(lk, [&] { return c->dead || c->seq > c->sent; });
            if (c->dead) return;
            std::vector<uint8_t> pkt;
            pkt.swap(c->next);
            uint64_t seq = c->seq;
            lk.unlock();

            uint32_t n = htonl(static_cast<uint32_t>(pkt.size()));
            bool ok = send_all(c->fd, reinterpret_cast<uint8_t*>(&n), 4) &&
                      send_all(c->fd, pkt.data(), pkt.size());
            if (ok) packets_sent.fetch_add(1);

            lk.lock();
            c->sent = seq;
            if (!ok) {
                c->dead = true;
                return;
            }
        }
    }

    static bool send_all(int fd, const uint8_t* p, size_t n) {
        while (n > 0) {
            ssize_t w = ::send(fd, p, n, MSG_NOSIGNAL);
            if (w <= 0) return false;
            p += w;
            n -= static_cast<size_t>(w);
        }
        return true;
    }

    void publish(const uint8_t* data, size_t size) {
        std::lock_guard<std::mutex> lk(clients_mu);
        for (auto* c : clients) {
            std::lock_guard<std::mutex> ck(c->mu);
            if (c->dead) continue;
            c->next.assign(data, data + size);
            ++c->seq;
            c->cv.notify_all();
        }
    }

    int num_clients() {
        std::lock_guard<std::mutex> lk(clients_mu);
        int n = 0;
        for (auto* c : clients)
            if (!c->dead) ++n;
        return n;
    }

    ~Publisher() {
        stop.store(true);
        if (listen_fd >= 0) ::shutdown(listen_fd, SHUT_RDWR), ::close(listen_fd);
        if (acceptor.joinable()) acceptor.join();
        std::lock_guard<std::mutex> lk(clients_mu);
        for (auto* c : clients) {
            {
                std::lock_guard<std::mutex> ck(c->mu);
                c->dead = true;
                c->cv.notify_all();
            }
            ::shutdown(c->fd, SHUT_RDWR);
            ::close(c->fd);
            c->sender.join();
            delete c;
        }
    }
};

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* snapshot_writer_create(const char* path) {
    return new SnapshotWriter(path);
}
void snapshot_writer_submit(void* h, const uint8_t* data, uint64_t size) {
    static_cast<SnapshotWriter*>(h)->submit(data, size);
}
void snapshot_writer_wait(void* h) {
    static_cast<SnapshotWriter*>(h)->wait_idle();
}
void snapshot_writer_destroy(void* h) {
    delete static_cast<SnapshotWriter*>(h);
}

void* publisher_create(int port) {
    auto* p = new Publisher(port);
    if (p->listen_fd < 0) {
        delete p;
        return nullptr;
    }
    return p;
}
int publisher_port(void* h) { return static_cast<Publisher*>(h)->port; }
int publisher_num_clients(void* h) {
    return static_cast<Publisher*>(h)->num_clients();
}
uint64_t publisher_packets_sent(void* h) {
    return static_cast<Publisher*>(h)->packets_sent.load();
}
void publisher_publish(void* h, const uint8_t* data, uint64_t size) {
    static_cast<Publisher*>(h)->publish(data, size);
}
void publisher_destroy(void* h) { delete static_cast<Publisher*>(h); }

}  // extern "C"
