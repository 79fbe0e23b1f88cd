/* Minimal binary-compatible Kafka Connect API declaration — see ConnectorContext.java. */
package org.apache.kafka.connect.connector;

import java.util.Map;

public interface Task {
    String version();

    void start(Map<String, String> props);

    void stop();
}
