/* Minimal binary-compatible Kafka Connect API declaration — see ConnectorContext.java. */
package org.apache.kafka.connect.connector;

import java.util.List;
import java.util.Map;

public abstract class Connector {

    protected ConnectorContext context;

    public void initialize(ConnectorContext ctx) {
        this.context = ctx;
    }

    public void initialize(ConnectorContext ctx, List<Map<String, String>> taskConfigs) {
        this.context = ctx;
    }

    public ConnectorContext context() {
        return context;
    }

    public abstract void start(Map<String, String> props);

    public void reconfigure(Map<String, String> props) {
        stop();
        start(props);
    }

    public abstract Class<? extends Task> taskClass();

    public abstract List<Map<String, String>> taskConfigs(int maxTasks);

    public abstract void stop();

    public abstract String version();
}
